package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r36 scaling-curve point generator + engine timing (BENCH_NOTES
  * "r36 scaling curve"): builds the EXACT r36 block structure — 8-node
  * blocks wiring two 3-cycles, a value-driven A→B bridge and a 2-node
  * tail — at an arbitrary synthetic order count (the structure is
  * data-derived, so scaling the generator IS scaling the graph; the
  * TPC tables stop at sf1), writes the edge list to parquet for the
  * DuckDB closure oracle (tools/scc_curve_oracle.py reads the same
  * file), and times [[graft.graph.Scc.scc]] + the component-size
  * rollup over a fresh read of that parquet: one warmup, then minimum
  * of `passes` noop-sink runs — the Bench methodology.
  *
  * Usage: runMain graft.tools.SccCurve <nOrders> <outDir> [passes]
  * (sf1 ≈ 1.5e6 orders → 30k nodes; 7.5e6 → 150k nodes = the 5× point)
  */
object SccCurve {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SccCurve <nOrders> <outDir> [passes]")
    val nOrders = args(0).toLong
    val outDir = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the r36 wiring (queries/GraphQ.scala "r36_scc_scaled"), with
    // synthetic orderkeys 0..nOrders-1 in place of o_orderkey — the
    // hash draw makes the residue mix identical in distribution
    val nn = 8L * math.max(nOrders / 400, 8L)
    val h0 = spark.range(nOrders).select(col("id").as("o_orderkey"),
      (graft.functions.text.saltedHash32(
        col("id").cast("string"), 1) % nn).cast("long").as("n"))
    val r = col("n") % 8
    val blockBase = col("n") - r
    val ring = h0.select(col("n").as("src"),
      when(r === 2 || r === 5, col("n") - 2)
        .when(r === 7, blockBase + 3)
        .otherwise(col("n") + 1).as("dst"))
    val bridge = h0.filter(col("o_orderkey") % 3 === 0 && r === 1)
      .select(col("n").as("src"), (blockBase + 3).as("dst"))
    val edgesPath = s"$outDir/edges.parquet"
    ring.unionByName(bridge).write.mode("overwrite").parquet(edgesPath)

    def onePass(): Double = {
      val t0 = System.nanoTime()
      graft.graph.Scc.scc(spark.read.parquet(edgesPath))
        .groupBy(col("scc"))
        .agg(count(lit(1)).as("n_members"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    onePass() // warmup
    val secs = (1 to passes).map(_ => onePass())
    val nScc = graft.graph.Scc.scc(spark.read.parquet(edgesPath))
      .select(col("scc")).distinct().count()
    println(s"""{"tool":"scc_curve","n_orders":$nOrders,"nn":$nn,""" +
      s""""n_scc":$nScc,"passes":${secs.mkString("[", ",", "]")},""" +
      s""""spark_sec":${secs.min}}""")
    spark.stop()
  }
}
