package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session()
    import graft.Tables
    val docs = Tables(spark, sfDir).documents
    val (thetaNum, thetaDen, shingleN) = (3, 5, 3)
    val items = coalesce(
      graft.plans.MinHashShingles
        .minhashShingles(graft.functions.text.normText(col("text")), 1, shingleN)
        .getField("sh"),
      array().cast("array<string>"))

    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      val shing = t("shing checkpoint") {
        docs.select(col("doc_id"), array_remove(items, "").as("sh"))
          .filter(size(col("sh")) > 0)
          .localCheckpoint()
      }
      val tok = shing.select(col("doc_id"), explode(col("sh")).as("t"))
      t("tok count")(println(tok.count()))
      val dfc = tok.groupBy(col("t")).agg(count(lit(1)).as("dfc"))
      t("dfc count")(println(dfc.count()))
      val byDoc = Window.partitionBy(col("doc_id"))
      val ranked = tok.join(dfc, Seq("t"))
        .withColumn("sz", count(lit(1)).over(byDoc))
        .withColumn("rn", row_number().over(byDoc.orderBy(col("dfc"), col("t"))))
      val pref = ranked.filter(col("rn") <=
        col("sz") - expr(s"(($thetaNum * sz + $thetaDen - 1) div $thetaDen)") + 1)
      t("pref noop")(pref.write.format("noop").mode("overwrite").save())
      val cands = pref.select(col("doc_id").as("a"), col("t"), col("sz").as("sza"))
        .join(pref.select(col("doc_id").as("b"), col("t").as("rt"),
            col("sz").as("szb")),
          col("t") === col("rt") && col("a") < col("b") &&
            col("sza") * thetaNum <= col("szb") * thetaDen &&
            col("szb") * thetaNum <= col("sza") * thetaDen)
        .select(col("a"), col("b")).dropDuplicates("a", "b")
      t("cands count")(println(cands.count()))
      val out = cands
        .join(shing.select(col("doc_id").as("a"), col("sh").as("ta")), Seq("a"))
        .join(shing.select(col("doc_id").as("b"), col("sh").as("tb")), Seq("b"))
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
        .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
        .filter(col("inter") * thetaDen >= col("uni") * thetaNum)
      t("verify noop")(out.write.format("noop").mode("overwrite").save())
      val candsCp = t("cands checkpoint")(cands.localCheckpoint())
      val candIds = candsCp.select(col("a").as("doc_id"))
        .unionByName(candsCp.select(col("b").as("doc_id"))).distinct()
      t("candIds count")(println(candIds.count()))
      val need = shing.join(candIds, Seq("doc_id"), "left_semi")
      t("need count")(println(need.count()))
      val out2 = candsCp
        .join(need.select(col("doc_id").as("a"), col("sh").as("ta")).hint("shuffle_hash"), Seq("a"))
        .join(need.select(col("doc_id").as("b"), col("sh").as("tb")).hint("shuffle_hash"), Seq("b"))
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
        .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
        .filter(col("inter") * thetaDen >= col("uni") * thetaNum)
        .select(col("a"), col("b"),
          round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      t("verify2 noop")(out2.write.format("noop").mode("overwrite").save())
      val out3 = candsCp
        .join(shing.select(col("doc_id").as("a"), col("sh").as("ta")).hint("shuffle_hash"), Seq("a"))
        .join(shing.select(col("doc_id").as("b"), col("sh").as("tb")).hint("shuffle_hash"), Seq("b"))
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
        .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
        .filter(col("inter") * thetaDen >= col("uni") * thetaNum)
        .select(col("a"), col("b"),
          round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      t("verify3 noop (no semi)")(out3.write.format("noop").mode("overwrite").save())
      t("full pipeline") {
        graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 5, 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
