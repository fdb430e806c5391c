package graft

import org.apache.spark.sql.functions._
import graft.gtfs.Fares

/** GTFS fare costing (gtfs/Fares) — hand-computed itineraries against
  * the reference feed's OWN fare_attributes.txt / fare_rules.txt (7
  * fares, 28 route rules), plus allowance/expiry edges on a synthetic
  * tariff. Oracled end-to-end at fact scale by r24.
  */
class FaresSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val refAttrs = spark.read.option("header", "true")
    .csv("/root/reference/gtfs/fare_attributes.txt")
    .select(col("fare_id"), col("price").cast("long"),
      col("transfers").cast("int"),
      col("transfer_duration").cast("long"))
  private lazy val refRules = spark.read.option("header", "true")
    .csv("/root/reference/gtfs/fare_rules.txt")
    .select(col("fare_id"), col("route_id"))

  private def cost(legs: Seq[(Long, Int, Long, String)]) =
    Fares.itineraryFares(
        legs.toDF("itin_id", "leg_seq", "board_t", "route_id"),
        refRules, refAttrs)
      .as[(Long, Long, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("reference tariff: unlimited-transfer fare rides the whole " +
    "mjt network on one ticket inside its 5400 s window") {
    // routes 1..6 carry mjt_regular 4900 and mjt_concession 2000 —
    // cheapest wins (concession), transfers unlimited, window 5400 s
    val got = cost(Seq((1L, 1, 0L, "1"), (1L, 2, 1000L, "3"),
      (1L, 3, 5000L, "6")))
    assert(got(1L) == ((2000L, 1, 2, 0)))
  }

  test("reference tariff: the window EXPIRES — re-boarding after " +
    "5400 s buys a second ticket") {
    val got = cost(Seq((1L, 1, 0L, "1"), (1L, 2, 6000L, "2")))
    assert(got(1L) == ((4000L, 2, 0, 0)))
  }

  test("reference tariff: zero-transfer fares pay per leg (tmb), and " +
    "crossing agencies always buys") {
    // tmb_regular/concession are both 4000 with transfers=0, dur 0 —
    // every K-route leg pays (tie: tmb_concession by fare_id order,
    // same price)
    val tmb = cost(Seq((1L, 1, 0L, "K1"), (1L, 2, 10L, "K2")))
    assert(tmb(1L) == ((8000L, 2, 0, 0)))
    // mjt ticket does not cover kci's B route: buy kci_b (5000)
    val cross = cost(Seq((2L, 1, 0L, "1"), (2L, 2, 100L, "B")))
    assert(cross(2L) == ((2000L + 5000L, 2, 0, 0)))
  }

  test("uncovered legs cost nothing, are counted, and keep the active " +
    "ticket alive") {
    // route Z has no fare rule; the mjt ticket stays active across it
    val got = cost(Seq((1L, 1, 0L, "2"), (1L, 2, 100L, "Z"),
      (1L, 3, 200L, "4")))
    assert(got(1L) == ((2000L, 1, 1, 1)))
  }

  test("NULL transfer_duration means the window never expires (the " +
    "OTP reading of an empty field); 0 expires immediately") {
    val attrs = Seq(
      ("open", 100L, Option.empty[Int], Option.empty[Long]),
      ("instant", 100L, Option.empty[Int], Some(0L)))
      .toDF("fare_id", "price", "transfers", "transfer_duration")
    def one(fare: String): (Long, Int, Int, Int) = {
      val rules = Seq((fare, "r")).toDF("fare_id", "route_id")
      val legs = Seq((1L, 1, 0L, "r"), (1L, 2, 1000000L, "r"))
        .toDF("itin_id", "leg_seq", "board_t", "route_id")
      val r = Fares.itineraryFares(legs, rules,
        attrs.filter(col("fare_id") === fare))
        .as[(Long, Long, Int, Int, Int)].collect()(0)
      (r._2, r._3, r._4, r._5)
    }
    // null window: one ticket covers a leg a million seconds later
    assert(one("open") == ((100L, 1, 1, 0)))
    // zero window: the second leg re-buys
    assert(one("instant") == ((200L, 2, 0, 0)))
  }

  test("FINITE transfer allowance decrements and then re-buys") {
    val attrs = Seq(("one_xfer", 100L, Some(1), Some(10000L)))
      .toDF("fare_id", "price", "transfers", "transfer_duration")
    val rules = Seq(("one_xfer", "r")).toDF("fare_id", "route_id")
    val legs = Seq((1L, 1, 0L, "r"), (1L, 2, 10L, "r"),
      (1L, 3, 20L, "r"), (1L, 4, 30L, "r"))
      .toDF("itin_id", "leg_seq", "board_t", "route_id")
    val got = Fares.itineraryFares(legs, rules, attrs)
      .as[(Long, Long, Int, Int, Int)].collect()(0)
    // buy (leg1), free (leg2, allowance 1->0), buy (leg3), free (leg4)
    assert((got._2, got._3, got._4, got._5) == ((200L, 2, 2, 0)))
  }

  test("result is partition-invariant and leg order comes from " +
    "leg_seq, not row order") {
    val legs = Seq((1L, 3, 5000L, "6"), (1L, 1, 0L, "1"),
      (1L, 2, 1000L, "3"))
      .toDF("itin_id", "leg_seq", "board_t", "route_id")
      .repartition(7)
    val got = Fares.itineraryFares(legs, refRules, refAttrs)
      .as[(Long, Long, Int, Int, Int)].collect()(0)
    assert((got._2, got._3, got._4, got._5) == ((2000L, 1, 2, 0)))
  }
}
