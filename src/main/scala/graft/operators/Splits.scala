package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic dataset splitting for training pipelines: every id maps
  * to a stable percentage bucket via the engine's md5-prefix hash (NOT
  * Spark's murmur `hash()` — md5 is engine-independent, so the oracle and
  * any other system can reproduce the exact split), and buckets map to
  * named splits by cumulative percentage.
  *
  * Per-row expression — no shuffle, no sampling nondeterminism, stable
  * under reruns and partitioning changes. Group-stratified splits (all of
  * a user's docs in one split) fall out by hashing the group key instead
  * of the row id.
  */
object Splits {

  /** Stable bucket in [0, 100) for an id column. */
  def pctBucket(idCol: Column, salt: Int = 0): Column =
    graft.functions.text.saltedHash32(idCol.cast("string"), salt) % 100

  /** Named split by cumulative percentages, e.g.
    * `Seq("train" -> 90, "val" -> 5, "test" -> 5)` (must sum to 100).
    */
  def assignSplit(idCol: Column, cuts: Seq[(String, Int)],
                  salt: Int = 0): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = pctBucket(idCol, salt)
    val cum = cuts.scanLeft(0)(_ + _._2).tail
    cuts.zip(cum).init.foldRight(lit(cuts.last._1)) {
      case (((name, _), upper), el) => when(b < upper, name).otherwise(el)
    }
  }

  /** Deterministic STRATIFIED sampling predicate: keep a row iff its
    * id's stable bucket falls under its stratum's percentage — per-class
    * downsampling (e.g. rebalance a language-skewed corpus) as a pure
    * per-row filter: no sampleBy nondeterminism, no shuffle, same rows
    * kept on every rerun/engine. Unlisted strata keep `defaultPct`.
    */
  def stratifiedKeep(idCol: Column, stratumCol: Column,
                     pct: Seq[(String, Int)], defaultPct: Int = 100,
                     salt: Int = 0): Column = {
    require((defaultPct +: pct.map(_._2)).forall(p => p >= 0 && p <= 100),
      "percentages must be within [0, 100]")
    val rate = pct.foldRight(lit(defaultPct)) {
      case ((stratum, p), el) => when(stratumCol === stratum, p).otherwise(el)
    }
    pctBucket(idCol, salt) < rate
  }

  /** Weight-proportional deterministic Bernoulli keep: a row survives
    * iff its id's stable 10⁴ bucket falls below the row's own weight in
    * basis points (0 = never, 10000 = always). The importance-sampling
    * primitive: per-row keep probability ∝ any engine-computable score
    * (quality, length, domain weight) as a pure predicate — zero
    * shuffle, exactly reproducible across engines/reruns/partitionings,
    * and monotone in the weight (raising a row's weight can only keep
    * it kept, so resampling at a higher rate extends the sample instead
    * of reshuffling it).
    */
  def keepByWeightBp(idCol: Column, weightBp: Column,
                     salt: Int = 0): Column =
    (graft.functions.text.saltedHash32(idCol.cast("string"), salt)
      % 10000) < weightBp

  /** Token-budget source mixing: keep each group's rows, in a
    * deterministic pseudo-random order (md5 bucket, then id), until the
    * group's token budget is reached — greedy admission, so the first row
    * that crosses the budget is still kept (every group with any data
    * contributes at least one row). This is the data-mixing primitive of
    * a training pipeline: cap each source/domain at N tokens instead of
    * letting corpus size dictate the mixture.
    *
    * Scale shape: one shuffle on the group key + an ordered window per
    * group. Exact greedy admission is inherently sequential per group;
    * if one group dwarfs the rest, pre-thin it with [[stratifiedKeep]]
    * (rate ≈ budget/group-tokens) before the exact pass so the window
    * never scans far past the budget.
    */
  def capTokensPerGroup(df: DataFrame, groupCol: String, idCol: String,
                        tokenCol: String, budget: Long,
                        salt: Int = 0): DataFrame = {
    // the temp column would silently clobber (and then drop) a caller
    // column of the same name — fail loudly instead
    require(!df.columns.contains("__cum"),
      "capTokensPerGroup: input already has a __cum column — rename it")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(pctBucket(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") - col(tokenCol) < budget)
      .drop("__cum")
  }

  /** Two-phase [[capTokensPerGroup]] for skewed mixtures: when one group
    * dwarfs the budget (a 100×-over-budget web crawl next to small curated
    * sources), the exact pass's ordered window would scan the whole group
    * just to discard 99% of it. Phase 1 computes per-group token totals
    * (one cheap aggregate) and derives a [[stratifiedKeep]] pre-thinning
    * rate of ~`slack · budget / total` per group; phase 2 runs the exact
    * greedy pass over the survivors, which now total O(slack · budget)
    * tokens per group.
    *
    * EXACTNESS: the greedy window orders rows by (pctBucket, id) and
    * stratifiedKeep keeps exactly the rows with pctBucket below the rate —
    * i.e. a PREFIX of that same order — so greedy admission over the
    * survivors equals greedy admission over the full group whenever the
    * budget is crossed inside the prefix. `slack` (≥ 1.05) sizes the
    * prefix to `slack × budget` expected tokens so that holds with margin;
    * under `spark.graft.debug.validate=true` the property is asserted
    * per group (loud failure, never a silent under-fill).
    */
  def capTokensPerGroupAuto(df: DataFrame, groupCol: String, idCol: String,
                            tokenCol: String, budget: Long,
                            salt: Int = 0, slack: Double = 1.5): DataFrame = {
    require(slack >= 1.05, s"slack=$slack leaves no margin over the budget")
    require(!df.columns.contains("__keep_pct"),
      "capTokensPerGroupAuto: input already has a __keep_pct column")
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).as("__grp_tokens"))
      // integer percent for pctBucket's 0..99 buckets: ceil, floor 1, cap 100
      .select(col(groupCol),
        least(lit(100L), greatest(lit(1L),
          ceil(lit(100.0 * slack * budget) / col("__grp_tokens"))
            .cast("long"))).cast("int").as("__keep_pct"))
    // totals is one row per group — broadcast, no extra shuffle of df
    val validate = df.sparkSession.conf
      .getOption("spark.graft.debug.validate").contains("true")
    val thinned0 = df.join(broadcast(totals), Seq(groupCol))
      .filter(pctBucket(col(idCol), salt) < col("__keep_pct"))
    // validation rides a per-group total over the PRE-cap survivors (the
    // prefix the exact pass will scan); evaluated on admitted rows, so a
    // group only escapes the check if its entire prefix is empty — which
    // needs every id of a >slack·budget group to hash into the dropped
    // 1−rate tail, vanishingly unlikely at exactly the sizes that thin
    val thinned = if (validate) {
      val wg = Window.partitionBy(col(groupCol))
      thinned0.withColumn("__prefix_total", sum(col(tokenCol)).over(wg))
    } else thinned0
    val capped = capTokensPerGroup(
      thinned, groupCol, idCol, tokenCol, budget, salt)
    val validated =
      if (validate)
        // a thinned group (keep_pct < 100) must cross the budget inside
        // its surviving prefix, or the thinned greedy result could admit
        // fewer rows than the exact pass — rewrite tokenCol through a
        // raise_error branch so the check can't be pruned as unused
        capped.withColumn(tokenCol,
            when(col("__keep_pct") === 100 ||
                 col("__prefix_total") >= budget, col(tokenCol))
              .otherwise(raise_error(concat(
                lit("capTokensPerGroupAuto: thinned group "),
                col(groupCol).cast("string"),
                lit(" did not reach the budget — raise slack")))
                .cast(df.schema(tokenCol).dataType)))
          .drop("__prefix_total")
      else capped
    // the broadcast join moved groupCol to the front — restore the
    // caller's column order (output schema == input schema)
    validated.select(df.columns.map(col): _*)
  }

  /** Target-distribution mixture (the static data-mixing step DoReMi &
    * friends optimize dynamically): given per-group target SHARES in
    * basis points (must sum to 10000), downsample every group so the
    * kept corpus matches the target distribution at the LARGEST total
    * the data admits. The binding group — the one whose target share
    * most exceeds its actual share — is kept whole (rate 10000); every
    * other group thins proportionally. All arithmetic is exact
    * integers: feasible total B = min over groups of
    * (actual·10000 div share); per-group rate = (B·share div 10000)·
    * 10000 div actual; a row survives iff its [[keepByWeightBp]] md5
    * draw lands under its group's rate — deterministic, reproducible
    * cross-engine, and monotone (raising a target only adds rows).
    * Kept token mass matches the target in expectation (the hash is
    * uniform); use [[capTokensPerGroup]] when exact greedy admission
    * is required. Groups absent from `targetsBp` are dropped; target
    * groups absent from the corpus drop out of the min (their share
    * is unachievable at any size).
    *
    * Scale shape: one map-side-combined aggregate builds the
    * group-totals frame (bounded by group count); B and the rates stay
    * a one-row/short broadcast — no collect, no driver loop; the
    * corpus-side pass is a broadcast join + per-row hash filter at
    * scan speed. Output: the input rows that survive, plus `rate_bp`.
    */
  def mixToTarget(df: DataFrame, groupCol: String, idCol: String,
                  tokenCol: String, targetsBp: Seq[(String, Int)],
                  salt: Int = 0): DataFrame = {
    require(targetsBp.nonEmpty, "need at least one target group")
    require(targetsBp.map(_._1).distinct.size == targetsBp.size,
      "target groups must be distinct")
    require(targetsBp.forall(_._2 > 0), "target shares must be positive")
    require(targetsBp.map(_._2).sum == 10000,
      s"target shares must sum to 10000 bp, got ${targetsBp.map(_._2).sum}")
    val spark = df.sparkSession
    val targets = spark.createDataFrame(targetsBp).toDF("__g", "__share")
    val actual = df
      .filter(col(groupCol).isin(targetsBp.map(_._1): _*))
      .groupBy(col(groupCol).as("__g"))
      .agg(sum(col(tokenCol).cast("long")).as("__actual"))
      .join(targets, Seq("__g"))
    val feasible = actual
      .agg(min(expr("__actual * 10000 div __share")).as("__b"))
    val rates = actual.crossJoin(broadcast(feasible))
      .select(col("__g"),
        expr("((__b * __share) div 10000) * 10000 div __actual")
          .as("rate_bp"))
    df.join(broadcast(rates), col(groupCol) === col("__g"))
      .filter(keepByWeightBp(col(idCol), col("rate_bp"), salt))
      .select(df.columns.map(col) :+ col("rate_bp"): _*)
  }

  /** Deterministic global-shuffle shard manifest — the last step before
    * a training run: assign every row to one of `numShards` shards and a
    * position WITHIN its shard, such that (a) each shard is an unbiased
    * sample of the corpus (shard = stable md5 hash of the id — adjacent
    * source documents scatter across shards, so no shard is "all of one
    * crawl"), (b) within-shard order is itself a reproducible pseudo-
    * random permutation (ordered by an independently-salted hash, id
    * tiebreak — a loader streaming shard k sequentially sees an unbiased
    * sample prefix at every cut-off), and (c) the whole manifest is a
    * pure function of the id SET: re-partitioned or re-ordered input
    * reproduces it bit-for-bit per engine-independent md5
    * ([[pctBucket]]'s doctrine; Spark's `rand`/`repartition` round-robin
    * give neither). A row's SHARD never changes as the corpus grows;
    * positions are relative to the set, so an epoch manifest is cut per
    * corpus snapshot.
    *
    * Scale shape: one shuffle on the shard key, then per-shard
    * row_number — each shard sorts independently in its own partitions
    * (Spark range-partitions within the window partition), so shards
    * parallelize and no global sort exists. numShards should be ≥ the
    * write parallelism you want; at 100 TB the manifest IS the shard
    * writer's input, `partitionBy("shard")`.
    *
    * Output: all input columns + (shard INT, pos BIGINT), pos starting
    * at 1 in hash-then-id order within each shard.
    */
  def shardManifest(df: DataFrame, idCol: String, numShards: Int,
                    salt: Int = 0): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val shard = pmod(graft.functions.text.saltedHash32(
      col(idCol).cast("string"), salt), lit(numShards)).cast("int")
    val order = graft.functions.text.saltedHash32(
      col(idCol).cast("string"), salt + 1)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(order, col(idCol)))
        .cast("bigint"))
  }

  /** Temperature-scaled mixture rates, α = 1/2 — the multilingual
    * rebalance of mT5/XLM-R (Xue et al. 2021 §3.3; Conneau & Lample
    * 2019 §3): sampling shares proportional to n^α instead of n, so
    * head languages shrink and tail languages grow without any group
    * being dropped. Everything after the integer square root is exact
    * integer arithmetic: share_bp = ⌊isqrt·10⁴ / Σ isqrt⌋, rate_bp =
    * min(10⁴, ⌊budgetRows·share_bp / n⌋), and the draw itself is the
    * [[keepByWeightBp]] per-row hash predicate at rate_bp. isqrt =
    * ⌊√n⌋ is itself engine-exact: IEEE sqrt is correctly rounded and an
    * exact integer's true root is never within an ulp of the next
    * integer (squares are ≥ 2√n+1 apart), so the floor agrees
    * everywhere.
    *
    * Output: one row per group — (group, n, share_bp, rate_bp, n_kept)
    * where n_kept counts the rows the predicate admits (the realized
    * mixture; expectation budgetRows·share_bp/10⁴, binomial jitter).
    *
    * Scale shape: one map-side-combined count per group; the rate table
    * is keys-scale (compute it with a single-partition window — it
    * holds one row per language/source, not per document) and
    * BROADCASTS back for the admission count, which is a second
    * map-side-combined aggregate. The corpus is scanned twice and
    * shuffled never; the admission predicate is the same
    * partition-independent hash as every Splits draw, so the kept SET
    * is identical under any partitioning and extends monotonically if
    * the budget rises.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
                         budgetRows: Long, salt: Int = 0): DataFrame = {
    require(budgetRows > 0, s"budgetRows must be positive, got $budgetRows")
    val rates = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("isqrt", floor(sqrt(col("n"))).cast("bigint"))
      .withColumn("share_bp",
        expr("isqrt * 10000 div sum(isqrt) over ()"))
      .withColumn("rate_bp",
        least(lit(10000L), expr(s"($budgetRows * share_bp) div n")))
      .drop("isqrt")
    val kept = df
      .join(broadcast(rates.select(col(groupCol), col("rate_bp"))),
        Seq(groupCol))
      .filter(keepByWeightBp(col(idCol), col("rate_bp"), salt))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq(groupCol), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
  }

  /** Weighted sampling WITHOUT replacement — exactly `k` rows, each
    * row's inclusion odds proportional to its weight, deterministic
    * (Efraimidis–Spirakis A-Res, Inf. Proc. Letters 2006): give every
    * row a reproducible uniform u ∈ (0,1] from its salted id hash, rank
    * by u^(1/w), keep the k largest. Unlike [[keepByWeightBp]] (a
    * Bernoulli rate per row, sample SIZE varies), this draws an exact-k
    * panel — the "pick 10k docs, long docs proportionally likelier" shape
    * of eval-set and seed-corpus construction.
    *
    * Weight contract: `weightCol` must be strictly positive — w = 0
    * yields a -Inf key and a w < 0 row flips the key's sign and always
    * wins the draw, so non-positive weights are rejected per row
    * (raise_error), not silently sampled.
    *
    * Cross-engine determinism, stated as invariants: u is the exact
    * dyadic rational (hash+1)/2³² (both engines compute the identical
    * double); its log is rounded ONCE to integer NANOS — a 10⁻⁹
    * quantum, ~10⁷ coarser than the engines' libm disagreement (~1 ulp
    * of ≤22) — and the rank key is the IEEE quotient of that exact
    * integer by the weight, so every comparison both engines make is
    * between bit-identical doubles (ln(u)/w orders identically to
    * u^(1/w) and cannot overflow). Ties break on id.
    *
    * Scale shape: a per-row codegen key followed by a global top-k —
    * Spark plans orderBy+limit as TakeOrderedAndProject: each partition
    * keeps its local k in a bounded heap and only k-row heads travel,
    * no full sort, no shuffle of the corpus. k is presumed
    * driver-bounded (a sample, not a split — use [[keepByWeightBp]]
    * when the draw itself must be row-scale).
    */
  def weightedSampleNoReplacement(df: DataFrame, idCol: String,
                                  weightCol: String, k: Int,
                                  salt: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = graft.functions.text.saltedHash32(col(idCol).cast("string"), salt)
    val u = (h + 1).cast("double") / lit(4294967296.0)
    val lnuNano = round(log(u) * 1e9).cast("bigint")
    val w = when(col(weightCol) > 0, col(weightCol).cast("double"))
      .otherwise(raise_error(concat(
        lit("weightedSampleNoReplacement: weight must be > 0, got "),
        // a NULL weight would null the whole concat and raise an opaque
        // message — coalesce keeps the diagnostic readable
        coalesce(col(weightCol).cast("string"), lit("NULL")))))
    df.withColumn("samp_key", lnuNano.cast("double") / w)
      .orderBy(col("samp_key").desc, col(idCol))
      .limit(k)
  }
}
