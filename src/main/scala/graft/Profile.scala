package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling tool: per-JOB wall-clock breakdown of a
  * query's timed (noop-sink) run — the job-level complement of
  * [[Explain]]'s plan dump. Each named query runs once untimed (JIT +
  * footer warmup, the Bench methodology), then once against the noop
  * sink with a listener recording every job's duration, stage count and
  * task count. Loop queries show their per-round cost directly: one
  * line per checkpoint/probe job.
  *
  * Usage: runMain graft.Profile [sfDir] <queryName ...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args.head.startsWith("/"))
        (args.head, args.drop(1).toSeq)
      else (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        args.toSeq)
    require(names.nonEmpty, "pass at least one query name")
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Graft.session()

    case class Job(id: Int, start: Long, var end: Long = -1L,
                   var stages: Int = 0, var tasks: Int = 0,
                   desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs.put(js.jobId, Job(js.jobId, js.time,
            stages = js.stageInfos.size,
            tasks = js.stageInfos.map(_.numTasks).sum, desc = d))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    })

    def run(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }

    for (name <- names) {
      run(name) // warmup
      jobs.clear()
      recording = true
      val t0 = System.nanoTime()
      run(name)
      val wall = (System.nanoTime() - t0) / 1e9
      recording = false
      println(f"\n===== $name%s  wall=$wall%.3f s =====")
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.id)
      val acc = js.filter(_.end > 0).map(j => j.end - j.start).sum / 1e3
      println(f"jobs=${js.size}%d  sum(job wall)=$acc%.3f s  " +
        "(gaps = driver planning/analysis time)")
      var prevEnd = -1L
      for (j <- js) {
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        prevEnd = if (j.end > 0) j.end else prevEnd
        println(f"  job ${j.id}%4d  ${dur}%7.3f s  gap=${gap}%6.3f  " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d  " +
          j.desc.take(70))
      }
    }
    spark.stop()
  }
}
