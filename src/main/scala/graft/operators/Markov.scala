package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order transition matrix over per-entity ordered event
  * sequences — the user-journey / session-flow model (which state
  * follows which, how often): `P(to | from)` as exact integer basis
  * points, the same integer-rate convention as Splits/Anomaly (a rate
  * is an exact count ratio, never an engine-dependent float).
  *
  * Scale shape: one shuffle on the entity key for the lag window (the
  * sequence order is per-entity, so the window partitions by entity —
  * no global sort), one map-side-combined aggregate on the (from, to)
  * pair, and a keys-scale window over `from` for the row-normalizing
  * totals (state vocabularies are bounded; the pair frame is at most
  * |states|², not row-scale). Nothing touches the driver.
  */
object Markov {

  /** (from_state, to_state, n, rate_bp) for every observed transition;
    * `rate_bp` = ⌊n·10⁴ / Σ n over from_state⌋ — exact integer division
    * of exact counts, identical on every engine.
    *
    * `orderCols` must be a deterministic total order within an entity
    * (include a unique id to break timestamp ties).
    */
  def transitionMatrix(df: DataFrame, entityCol: String, stateCol: String,
                       orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_state"),
        col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("from_state"))
    // exact integer division (`div`), not floor(double /): for from-state
    // totals ≥ ~1e14 the correctly-rounded double quotient can land ON the
    // next integer and floor one high — `div` keeps the cross-engine
    // bit-identity the doc promises (matches the oracle's `//`).
    pairs.withColumn("__tot", sum(col("n")).over(tot))
      .withColumn("rate_bp", expr("n * 10000 div __tot"))
      .drop("__tot")
  }
}
