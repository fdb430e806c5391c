package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: for each named query (or all), print the
  * formatted physical plan and three timed runs against a noop sink.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"\n===== $name =====")
      fn(spark, sfDir).explain("formatted")
      // SPARK_GRAFT_EXPLAIN_NOTIME=1 skips the timed passes (plan-file
      // capture for plans/r16 — timing there belongs to Bench)
      if (!sys.env.contains("SPARK_GRAFT_EXPLAIN_NOTIME")) {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[times] ${times.map(t => f"$t%.3f").mkString(" ")} sec")
      }
    }
    spark.stop()
  }
}
