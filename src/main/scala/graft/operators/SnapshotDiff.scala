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

  /** Changelog APPLY — the MERGE/upsert primitive of every lakehouse
    * table format (Delta/Iceberg/Hudi merge-on-read, Kimball type-1):
    * fold a CDC changelog into a snapshot. Per key, the changelog row
    * with the highest `seqCol` wins: op `U` upserts the changelog's
    * payload (replacing a snapshot row or inserting a new key), op `D`
    * deletes the key; keys the changelog never touches keep their
    * snapshot payload unchanged. The same-key/same-seq case must not
    * exist (a changelog with a non-deterministic winner is corrupt) —
    * enforced cheaply by the row_number tiebreak on op so reruns are
    * at least stable.
    *
    * `payloadCols` name the columns shared by snapshot and changelog;
    * output is (key, payloadCols*) — the next snapshot.
    *
    * Scale shape: the changelog compacts FIRST (per-key top-1 window —
    * one shuffle of the changelog, which is increment-sized, not
    * table-sized), then ONE full-outer equi-join against the snapshot
    * on the key. The snapshot's only movement is that join; against a
    * key-bucketed at-rest snapshot (sources/Warehouse) the exchange
    * elides and apply streams as a co-located sort-merge — the
    * merge-on-read compaction pass exactly. Nothing is quadratic,
    * nothing touches the driver.
    */
  /** TIME TRAVEL: reconstruct the table AS OF several versions in ONE
    * changelog pass. `cuts` are version cutoffs (ascending, distinct)
    * on `seqCol`; the result is the union of the reconstructed states,
    * tagged by a `version` column — for each cutoff v, exactly the rows
    * [[applyChangelog]] would produce if the changelog were filtered to
    * `seq <= v`, PROVIDED the input is tie-free on (key, seq) — the
    * documented contract (same-key/same-seq rows are corrupt input, as
    * there). On corrupt tied input the two paths pick different
    * winners (here max-struct lets 'U' and the payload participate;
    * applyChangelog's (seq desc, op asc) row_number lets 'D' win), so
    * the equality claim holds only for valid input.
    *
    * Scale shape — the reason this is an operator and not C filtered
    * applyChangelog calls: the changelog aggregates ONCE (per-key
    * max-struct with C conditional buffers — one increment-sized
    * shuffle, map-side combined, however many versions are read), then
    * ONE full-outer join moves the snapshot (elidable against a
    * key-bucketed at-rest snapshot, as in applyChangelog); the C-way
    * fan-out happens AFTER the join on the merged row — a bounded
    * model-free explode, no extra exchange. This is the lakehouse
    * as-of-read / incremental-audit primitive: version counts, replays
    * and retention checks over one scan of table + changelog.
    */
  def statesAt(snapshot: DataFrame, changelog: DataFrame,
               keyCol: String, seqCol: String, opCol: String,
               payloadCols: Seq[String], cuts: Seq[Long]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    require(cuts.nonEmpty && cuts == cuts.sorted && cuts.distinct == cuts,
      s"cuts must be ascending and distinct, got $cuts")
    val winners = cuts.zipWithIndex.map { case (cut, i) =>
      max(when(col(seqCol) <= cut,
        struct(col(seqCol) +: col(opCol) +: payloadCols.map(col): _*)))
        .as(s"__w$i")
    }
    val latest = changelog.groupBy(col(keyCol).as("__ck"))
      .agg(winners.head, winners.tail: _*)
    val merged = snapshot
      .join(latest, col(keyCol) === col("__ck"), "full_outer")
    // per cutoff: present iff the winner upserts, or no winner touches
    // the key and the snapshot has it (keyCol is null on the snapshot
    // side exactly for changelog-only keys)
    val states = cuts.zipWithIndex.map { case (cut, i) =>
      val w = col(s"__w$i")
      val fields = lit(cut).as("version") +:
        when(w.isNotNull, w.getField(opCol) === "U")
          .otherwise(col(keyCol).isNotNull).as("__present") +:
        payloadCols.map(c =>
          when(w.isNotNull && w.getField(opCol) === "U", w.getField(c))
            .otherwise(col(c)).as(c))
      struct(fields: _*)
    }
    merged
      .select(coalesce(col(keyCol), col("__ck")).as(keyCol),
        explode(array(states: _*)).as("__s"))
      .filter(col("__s.__present"))
      .select(col("__s.version").as("version") +: col(keyCol) +:
        payloadCols.map(c => col(s"__s.$c").as(c)): _*)
  }

  /** SCD TYPE-2 BUILD (Kimball slowly-changing dimension, the Delta/
    * Iceberg "history table" shape): turn snapshot + CDC changelog into
    * the full version history — one row per version interval with
    * (valid_from, valid_to, is_current). Snapshot rows open at
    * `snapshotSeq` (they ARE the version in force before the changelog
    * starts, so every changelog seq must be > snapshotSeq); each `U`
    * opens a version at its seq and closes the key's previous one; a
    * `D` closes without opening (a later `U` re-opens — gaps are real:
    * the key did not exist in between). `valid_to` is null while open;
    * every `U` opens a version even if the payload is unchanged (no-op
    * collapse is a policy layer, not this operator). Same-key/same-seq
    * input is corrupt, as in [[applyChangelog]].
    *
    * Scale shape: ONE union of two scans + ONE window shuffle on the
    * key (lead over seq). Nothing else moves; against key-bucketed
    * at-rest inputs (sources/Warehouse) even that exchange elides. The
    * output is history-sized (|snapshot| + |U rows|) by construction —
    * the operator never amplifies beyond its input.
    */
  def scd2(snapshot: DataFrame, changelog: DataFrame, keyCol: String,
           seqCol: String, opCol: String, payloadCols: Seq[String],
           snapshotSeq: Long = 0L): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val snapEv = snapshot.select(
      col(keyCol) +: lit(snapshotSeq).as(seqCol) +: lit("U").as(opCol) +:
        payloadCols.map(col): _*)
    // ENFORCE "every changelog seq must be > snapshotSeq" (the corrupt-
    // input posture applyChangelog documents): a row at seq ==
    // snapshotSeq would tie the synthetic snapshot opening event and
    // produce nondeterministic valid_from/valid_to instead of an error.
    // The check rides the existing scan — no extra pass.
    val guardedSeq = when(col(seqCol) > snapshotSeq, col(seqCol))
      .otherwise(raise_error(concat(
        lit(s"scd2: changelog $seqCol must be > snapshotSeq=$snapshotSeq, got "),
        // coalesce: a NULL seq must not null the diagnostic itself
        coalesce(col(seqCol).cast("string"), lit("NULL")))))
    scd2Events(snapEv.unionByName(changelog.select(
      col(keyCol) +: guardedSeq.cast("long").as(seqCol) +: col(opCol) +:
        payloadCols.map(col): _*)),
      keyCol, seqCol, opCol, payloadCols)
  }

  /** [[scd2]]'s core on a bare event frame (key, seq, op, payload) —
    * also the per-micro-batch rebuild step of the streaming face
    * (StreamingJobs.scd2Stream), where the "snapshot" is each touched
    * key's current OPEN version re-expressed as its own opening event.
    */
  def scd2Events(events: DataFrame, keyCol: String, seqCol: String,
                 opCol: String, payloadCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(seqCol))
    events
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) === "U")
      .select(col(keyCol) +: payloadCols.map(col) :+
        col(seqCol).cast("long").as("valid_from") :+
        col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

  def applyChangelog(snapshot: DataFrame, changelog: DataFrame,
                     keyCol: String, seqCol: String, opCol: String,
                     payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol))
    val latest = changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((col(keyCol).as("__ck") +: col(opCol).as("__op") +:
        payloadCols.map(c => col(c).as(s"__c_$c"))): _*)
    snapshot
      .join(latest, col(keyCol) === col("__ck"), "full_outer")
      .filter(col("__op").isNull || col("__op") === "U")
      .select(coalesce(col(keyCol), col("__ck")).as(keyCol) +:
        payloadCols.map(c =>
          when(col("__op") === "U", col(s"__c_$c"))
            .otherwise(col(c)).as(c)): _*)
  }
}
