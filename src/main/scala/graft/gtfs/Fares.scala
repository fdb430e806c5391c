package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GTFS fare costing — the query capability behind the reference feed's
  * fare_attributes.txt / fare_rules.txt (route-based rules with
  * transfer allowances: gtfs/fare_attributes.txt:1 carries price,
  * payment_method, transfers and transfer_duration per fare;
  * gtfs/fare_rules.txt:1 maps fares to routes). K5 ships those tables
  * verbatim; this operator makes them QUERYABLE: cost an itinerary of
  * route legs under GTFS fares-v1 semantics.
  *
  * Semantics (the deterministic subset, stated plainly):
  *  - a fare applies to a leg iff a fare_rule lists the leg's route
  *    (rule-less catch-all fares are the caller's pre-expansion);
  *  - riding a leg consumes the ACTIVE fare when that fare also applies
  *    to the leg's route, its transfer allowance is not exhausted
  *    (`transfers` null = unlimited, 0 = none, N = N re-boardings) and
  *    the leg boards within `transfer_duration` seconds of the fare's
  *    purchase (null duration = the window never expires — the reading
  *    GTFS consumers like OTP apply to an empty field; 0 = expires
  *    immediately) — otherwise the CHEAPEST applicable fare is
  *    purchased (tie: smallest fare_id), which becomes the active fare;
  *  - a leg with no applicable fare is counted `n_uncovered` (data gap,
  *    costed 0) and leaves the active fare untouched.
  *
  * Scale shape: fares × routes is dimension-bounded (the reference: 7
  * fares, 28 rules) — both lookups ride BROADCAST joins; the only
  * shuffle is the per-itinerary grouping, and the fold runs as one
  * `aggregate` HOF over each itinerary's leg array (journey-length
  * bounded — the W7/W8 ordered-fold doctrine), so the plan is
  * O(legs) + one exchange at any corpus size.
  */
object Fares {

  /** Cost itineraries. `legs`: (itin_id, leg_seq [1..n dense per
    * itinerary], board_t [seconds], route_id). `fareRules`: (fare_id,
    * route_id). `fareAttributes`: (fare_id, price [integer minor
    * units], transfers [int, null = unlimited], transfer_duration
    * [seconds, null = never expires, 0 = expires immediately]).
    * Output per itinerary: (itin_id,
    * total_price, n_purchases, n_free_transfers, n_uncovered).
    */
  def itineraryFares(legs: DataFrame, fareRules: DataFrame,
                     fareAttributes: DataFrame): DataFrame = {
    val attrs = fareAttributes.select(col("fare_id").cast("string"),
      col("price").cast("long").as("price"),
      col("transfers").cast("int").as("transfers"),
      col("transfer_duration").cast("long").as("dur")) // null = no expiry
    // per-route applicable fare set + cheapest applicable fare — both
    // dimension-bounded, broadcast to every leg
    val app = fareRules
      .select(col("fare_id").cast("string"), col("route_id")).distinct()
      .join(attrs, Seq("fare_id"))
    val perRoute = broadcast(app.groupBy(col("route_id"))
      .agg(collect_set(col("fare_id")).as("app_ids"),
        min_by(struct(col("fare_id"), col("price"), col("transfers"),
            col("dur")),
          struct(col("price"), col("fare_id"))).as("cheap")))
    val ordered = legs
      .join(perRoute, Seq("route_id"), "left")
      .groupBy(col("itin_id"))
      .agg(sort_array(collect_list(struct(
        col("leg_seq").cast("int").as("seq"),
        col("board_t").cast("long").as("t"),
        coalesce(col("app_ids"), array().cast("array<string>"))
          .as("app"),
        col("cheap")))).as("__legs"))
    // ordered fold: state = (active fare, purchase time, remaining
    // transfer allowance [-1 = unlimited], active duration, totals)
    val init = struct(
      lit(null).cast("string").as("af"), lit(0L).as("pt"),
      lit(0).as("rem"), lit(null).cast("long").as("adur"),
      lit(0L).as("tot"),
      lit(0).as("np"), lit(0).as("nf"), lit(0).as("nu"))
    def step(acc: Column, x: Column): Column = {
      val cheap = x.getField("cheap")
      val freeOk = acc.getField("af").isNotNull &&
        array_contains(x.getField("app"), acc.getField("af")) &&
        acc.getField("rem") =!= 0 &&
        (acc.getField("adur").isNull || // null window never expires
          x.getField("t") <= acc.getField("pt") + acc.getField("adur"))
      val hasFare = cheap.isNotNull
      val buy = !freeOk && hasFare
      val unc = !freeOk && !hasFare
      struct(
        when(buy, cheap.getField("fare_id"))
          .otherwise(acc.getField("af")).as("af"),
        when(buy, x.getField("t")).otherwise(acc.getField("pt")).as("pt"),
        when(buy, coalesce(cheap.getField("transfers"), lit(-1)))
          .when(freeOk && acc.getField("rem") > 0,
            acc.getField("rem") - 1)
          .otherwise(acc.getField("rem")).as("rem"),
        when(buy, cheap.getField("dur"))
          .otherwise(acc.getField("adur")).as("adur"),
        (acc.getField("tot") +
          when(buy, cheap.getField("price")).otherwise(lit(0L))).as("tot"),
        (acc.getField("np") + when(buy, 1).otherwise(0)).as("np"),
        (acc.getField("nf") + when(freeOk, 1).otherwise(0)).as("nf"),
        (acc.getField("nu") + when(unc, 1).otherwise(0)).as("nu"))
    }
    ordered.select(col("itin_id"),
      aggregate(col("__legs"), init, step).as("__s"))
      .select(col("itin_id"),
        col("__s").getField("tot").as("total_price"),
        col("__s").getField("np").as("n_purchases"),
        col("__s").getField("nf").as("n_free_transfers"),
        col("__s").getField("nu").as("n_uncovered"))
  }
}
