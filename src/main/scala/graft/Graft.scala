package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog for the graft engine.
  *
  * All testdata tables (TESTDATA.md) are parquet files under one scale-factor
  * directory; every query entry point receives that directory so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, by
  * design, on a real cluster path at 100 TB: nothing below ever collects a
  * table to the driver or depends on partition count.
  */
object Graft {

  /** Every glob-path batch read (e.g. `geojson/<id-glob>/ways.geojson`) makes
    * FileStreamSink.hasMetadata probe the LITERAL path for a streaming
    * sink's `_spark_metadata`; `getFileStatus` on the unexpanded glob
    * throws FileNotFoundException, which Spark logs at WARN **with the
    * full stack trace** before returning "not a streaming sink" and
    * proceeding. Harmless and deterministic, but under sbt the stack
    * lands on stderr as `[error] \tat ...` lines — indistinguishable
    * from a fatal crash in a char-budgeted log tail (it cost a round of
    * misdiagnosis as a "transient GTFS failure", BENCH_NOTES round 8).
    * A RegexFilter DENYs exactly the "Assume no metadata directory"
    * event (stack included — the filter drops the whole event) on that
    * one logger; every other message from it, including real
    * file-stream-sink write diagnostics, still flows. (The first cut
    * raised the whole logger to ERROR, which also swallowed legitimate
    * sink WARNs in streaming sessions.)
    *
    * Call AFTER the session exists (every entrypoint does): the created
    * LoggerConfig snapshots its parent's CURRENT level, and before any
    * session log4j runs its pre-init DefaultConfiguration whose root is
    * ERROR — calling first would freeze that in.
    */
  def silenceKnownBenignWarns(): Unit = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.Filter.Result
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.RegexFilter
    val name = "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink"
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val filter = RegexFilter.createFilter(
      ".*Assume no metadata directory.*", null, java.lang.Boolean.FALSE,
      Result.DENY, Result.NEUTRAL)
    val lc = cfg.getLoggerConfig(name) match {
      case c if c.getName == name => c
      case parent => // no explicit config yet: add one that inherits level
        val c = new LoggerConfig(name, parent.getLevel, true)
        cfg.addLogger(name, c)
        c
    }
    // idempotent: session() is called per-entrypoint and filters stack
    if (lc.getFilter == null) {
      lc.addFilter(filter)
      ctx.updateLoggers()
    }
  }

  /** Widen a pathologically narrow scan so a per-row-heavy kernel
    * parallelizes — the g10 row-group lesson, factored for every
    * kernel-dominated call site (map-match, BPE encode, span scrub,
    * pHash, minhash/winnowing via Tables.documentsKernelParallel).
    *
    * Parquet splits at ROW-GROUP granularity: a single-row-group file
    * (the local testdata writer's output) gives the scan ONE task no
    * matter how many cores exist, so per-row kernel cost runs serially
    * (g10 measured 8.2 s single-task at sf0.1 vs 5.8 s for 10× the rows
    * over sf1's 49 row groups). The guard widens ONLY when the scan
    * plans at less than half the session's parallelism — on real
    * multi-file cluster data the gate is false and NO shuffle is added;
    * the unconditional form would shuffle the whole corpus for nothing.
    */
  def kernelParallel(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < cores) df.repartition(cores) else df
  }

  /** Build a local session with scale-appropriate defaults. On a cluster the
    * same settings apply except master/memory come from spark-submit.
    */
  def session(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS) which Spark has no native
      // type for; read as long and normalize in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceKnownBenignWarns()
    spark
  }
}

/** Lazy readers for the driver-generated star schema at one scale factor.
  * Plain `spark.read.parquet` so Catalyst gets full pushdown/pruning.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** events.ts normalization: the generator has shipped the column as
    * parquet TIMESTAMP(NANOS) (arrives as LongType nanos under
    * spark.sql.legacy.parquet.nanosAsLong=true) and as naive
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false, which Spark 4 infers as
    * TIMESTAMP_NTZ — a type unix_micros/window/watermark reject).
    * Normalize both to a microsecond TimestampType column; the NTZ→LTZ
    * cast reinterprets the wall-clock under the session timeZone, which
    * every entrypoint pins to UTC, so the instants are identical to the
    * nanos-era values (and to DuckDB's naive-as-UTC epoch reading).
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table("events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _        => raw
    }
  }
  /** The text-kernel queries (minhash/simhash/winnowing/BPE…) burn their
    * CPU in per-row codegen kernels directly over this scan. The local
    * testdata is a single parquet row group, so Spark gives the scan ONE
    * task no matter how many cores exist (a row group is the minimum
    * split unit); `spark.graft.docs.repartition=N` (opt-in, unset by
    * default) round-robins the scan into N partitions so those kernels
    * parallelize. A no-op knob at cluster scale, where file splits
    * already provide parallelism — never set it there: it would shuffle
    * the whole corpus for nothing.
    */
  def documents: DataFrame = {
    val docs = table("documents")
    spark.conf.getOption("spark.graft.docs.repartition")
      .map(n => docs.repartition(n.toInt)).getOrElse(docs)
  }

  /** [[documents]] for KERNEL-DOMINATED scans (minhash, winnowing,
    * decontamination): repartitioned to defaultParallelism ONLY when the
    * scan plans fewer partitions — locally the testdata is a single
    * parquet row group (the minimum split unit), so the scan gets ONE
    * task and per-row kernels run serially (d02 measured 1.02→0.72 s at
    * sf0.1). At cluster scale file splits already exceed the core count,
    * the gate is false, and no shuffle happens — the unconditional form
    * would shuffle the whole corpus for nothing. Light queries should
    * stay on [[documents]]: the rebalance shuffle costs more than it
    * buys there (measured +0.1–0.2 s each, net loss on the 16-query doc
    * subset).
    */
  def documentsKernelParallel: DataFrame = Graft.kernelParallel(documents)
  def embeddings: DataFrame = table("embeddings")

  /** [[embeddings]] behind [[Graft.kernelParallel]] — for the
    * kernel-dominated corpus passes (Lloyd/PQ rounds, JL projection,
    * SQ8 encode): the local single-row-group file otherwise pins a
    * per-row-heavy scan to ONE task (the g10 pathology; v15 measured
    * 7.2 s single-task at sf1 for work 32 cores finish in well under a
    * second). Query-vector/codebook lookups should keep the plain
    * [[embeddings]] — a 1-row filter never amortizes a repartition.
    */
  def embeddingsKernelParallel: DataFrame = Graft.kernelParallel(embeddings)
}
