package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: classify every id across two snapshots of the
  * same table as added / removed / changed / unchanged by comparing a
  * content fingerprint — the data-versioning primitive behind
  * incremental corpus releases. What changed between crawl N and N+1
  * decides what re-runs downstream (re-dedup, re-embed, re-chunk,
  * re-pack); it complements [[Dedup.dedupAgainstCorpus]], which answers
  * "which NEW docs are novel" — the diff answers "what happened to
  * every doc".
  *
  * The fingerprint is md5 over the content columns joined with a \\u0001 
  * separator (null → empty string), so it is engine-independent and a
  * column-boundary shift ("ab","c" vs "a","bc") changes it.
  *
  * Scale shape: each side reduces to (id, fingerprint) — one narrow
  * 32-char column per row, computed per-row in the scan — then ONE
  * full-outer hash join on the id; document content never travels.
  * Against id-bucketed at-rest snapshots (sources/Warehouse) even that
  * exchange elides into a sort-merge over co-located buckets, which is
  * how two 100 TB snapshots diff without shuffling either one.
  */
object SnapshotDiff {

  /** Per-id diff of two snapshots. Output: (idCol, status) with status
    * in {added, removed, changed, unchanged}; `added`/`removed` are
    * relative to `oldSnap` → `newSnap`.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def fp(df: DataFrame, side: String) = df.select(
      col(idCol).as(s"${side}_id"),
      md5(concat_ws("\u0001",
        contentCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
        .as(s"${side}_fp"))
    fp(oldSnap, "o")
      .join(fp(newSnap, "n"), col("o_id") === col("n_id"), "full_outer")
      .select(coalesce(col("o_id"), col("n_id")).as(idCol),
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("o_fp") =!= col("n_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
