package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** k-anonymity by GLOBAL RECODING over a generalization ladder — the
  * privacy face of a training-data pipeline (the PII kernel scrubs
  * surface strings; this bounds RE-IDENTIFICATION: after release, every
  * quasi-identifier combination must describe at least k rows —
  * Sweeney 2002). The ladder is a fixed, total-ordered sequence of
  * generalization LEVELS, finest first (e.g. balance-centile →
  * balance-band → sign → '*'); the operator picks the FINEST level
  * whose under-k residue fits the suppression budget, generalizes every
  * row at that level, and fully suppresses ('*' on every QI column) the
  * rows whose group still falls under k.
  *
  * Deterministic end to end — level choice and suppression are pure
  * functions of (data, ladder, k, budget), so a SQL oracle replays them
  * exactly (no randomized microaggregation/Mondrian partitioning, whose
  * cell boundaries are engine-order-dependent).
  *
  * Scale shape: level statistics for ALL levels come from ONE shuffle —
  * each row explodes into (level, qi-key) pairs (the Expand operator
  * GROUPING SETS plans internally, written out so the ladder can be
  * arbitrary expressions), and counts map-side-combine, so the map
  * volume is (L+1)×rows but the shuffle is distinct-groups-sized. The
  * level decision collects L+1 numbers (driver-bounded by the ladder
  * length, the codebook-collect class). The release pass is one window
  * count over the chosen key — a second single shuffle. No per-level
  * passes, no driver data.
  */
object Anonymize {

  /** Canonical key for one level's QI tuple — a STRUCT, not a string
    * concat: struct equality is per-field, so no separator/sentinel can
    * collide two distinct tuples (("a\u0001b","c") vs ("a","b\u0001c"))
    * or a null with any real value — the k-count and the released
    * display groups always agree.
    */
  private def levelKey(qi: Seq[Column]): Column =
    struct(qi.map(_.cast("string")): _*)

  /** Per-level statistics — ONE aggregation pass for the whole ladder.
    * Returns rows (lvl, n_suppressed, n_groups, n_rows), one per level,
    * collected nowhere.
    */
  def levelStats(df: DataFrame, levels: Seq[Seq[Column]],
                 k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    val arity = levels.head.size
    require(levels.forall(_.size == arity),
      "every level must generalize the same QI arity")
    val lk = array(levels.zipWithIndex.map { case (qi, i) =>
      struct(lit(i).as("lvl"), levelKey(qi).as("key"))
    }: _*)
    df.select(explode(lk).as("lk"))
      .groupBy(col("lk.lvl").as("lvl"), col("lk.key").as("key"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lvl"))
      .agg(
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L))
          .as("n_suppressed"),
        count(lit(1)).as("n_groups"),
        // every row lands in every level's grouping, so per-level
        // sum(n) IS the table size — the total rides the same single
        // pass instead of a second scan (chooseLevel uses it)
        sum(col("n")).as("n_rows"))
  }

  /** The finest level whose under-k rows fit `maxSuppressedFrac` of the
    * table; the COARSEST level if none does (so the suppression budget
    * is a preference, never an availability failure — the coarsest
    * level's residue is then suppressed outright).
    */
  def chooseLevel(df: DataFrame, levels: Seq[Seq[Column]], k: Long,
                  maxSuppressedFrac: Double = 0.01): Int = {
    require(maxSuppressedFrac >= 0.0 && maxSuppressedFrac <= 1.0,
      s"maxSuppressedFrac must be in [0,1], got $maxSuppressedFrac")
    // L+1 rows to the driver: the ladder length bounds this collect;
    // the total rides levelStats' own pass (n_rows), no second scan
    val stats = levelStats(df, levels, k)
      .select(col("lvl"), col("n_suppressed"), col("n_rows"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val total = stats.headOption.map(_._3).getOrElse(0L)
    stats.filter(_._2 <= maxSuppressedFrac * total).map(_._1)
      .sorted.headOption.getOrElse(levels.size - 1)
  }

  /** The released table: one row per input row with the QI columns
    * rewritten at the chosen level (`names` are the released column
    * names), rows in under-k groups fully suppressed to '*', plus the
    * chosen level as `lvl`. Every released non-'*' group has ≥ k rows —
    * the k-anonymity invariant (AnonymizeSpec pins it property-style).
    *
    * ONLY `carry` columns ride through from the input — by default
    * NOTHING does: silently retaining the raw quasi-identifier source
    * columns next to their generalizations would defeat the release
    * (the classic re-identification footgun), so carrying any input
    * column is an explicit caller decision (sensitive-attribute
    * columns for analysis, never the QI sources).
    */
  def kAnonymize(df: DataFrame, levels: Seq[Seq[Column]],
                 names: Seq[String], k: Long,
                 maxSuppressedFrac: Double = 0.01,
                 carry: Seq[String] = Nil): DataFrame = {
    require(names.size == levels.head.size,
      "names must match the QI arity")
    require(carry.forall(df.columns.contains),
      "carry names an absent column")
    require(carry.intersect(names).isEmpty,
      "carry must not collide with released QI names")
    // the appended columns would silently overwrite carried data (lvl)
    // or collide with the internal group key (__qik)
    require(!carry.contains("lvl"),
      "carry must not contain 'lvl' — the released level column " +
        "overwrites it; rename the input column first")
    require(!df.columns.contains("__qik"),
      "input must not carry a '__qik' column (internal group key)")
    val lvl = chooseLevel(df, levels, k, maxSuppressedFrac)
    val qi = levels(lvl)
    val keyed = df.withColumn("__qik", levelKey(qi))
    val n = count(lit(1)).over(Window.partitionBy(col("__qik")))
    val released = names.zip(qi).map { case (nm, c) =>
      when(n >= k, c.cast("string")).otherwise(lit("*")).as(nm)
    }
    keyed.select(carry.map(col) ++ released: _*)
      .withColumn("lvl", lit(lvl))
  }

  /** Release SUMMARY — the oracle-checkable face: (QI columns at the
    * chosen level, group size, lvl), under-k groups collapsed into the
    * all-'*' row (re-grouped AFTER suppression, so a legitimate
    * coarsest-level '*' group and the suppression residue merge
    * deterministically instead of colliding).
    */
  def kAnonymousGroups(df: DataFrame, levels: Seq[Seq[Column]],
                       names: Seq[String], k: Long,
                       maxSuppressedFrac: Double = 0.01): DataFrame = {
    require(names.size == levels.head.size,
      "names must match the QI arity")
    val lvl = chooseLevel(df, levels, k, maxSuppressedFrac)
    val qi = levels(lvl)
    val grouped = df
      .groupBy(qi.zip(names).map { case (c, nm) =>
        c.cast("string").as(nm)
      }: _*)
      .agg(count(lit(1)).as("n"))
    val suppressed = names.map(nm =>
      when(col("n") >= k, col(nm)).otherwise(lit("*")).as(nm))
    grouped.select(suppressed :+ col("n"): _*)
      .groupBy(names.map(col): _*)
      .agg(sum(col("n")).as("n"))
      .withColumn("lvl", lit(lvl))
  }
}
