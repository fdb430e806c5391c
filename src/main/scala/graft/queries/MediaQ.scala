package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal/binary-column operators over the documents table: the text
  * bytes stand in for opaque media blobs (the container ships no codecs —
  * see graft.multimodal). m01 is oracle-checked (byte length + digest over
  * the binary column); m02 exercises the batched partition-decode plumbing
  * with the deterministic stub codec (rows-only check by design).
  */
object MediaQ extends QueryPack {

  private def withBlob(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> { (s, dir) =>
      withBlob(s, dir)
        .select(col("doc_id"),
          octet_length(col("blob")).as("n_bytes"),
          // md5-of-hex: DuckDB's md5/sha256 only take VARCHAR, so both
          // engines digest the lowercase hex rendering of the bytes
          md5(lower(hex(col("blob")))).as("digest"))
        .orderBy(col("doc_id"))
    },

    "m02_stub_decode" -> { (s, dir) =>
      Multimodal.decodeMeta(withBlob(s, dir), "blob")
        .select(col("doc_id"), col("media_meta.byte_len").as("byte_len"),
          col("media_meta.format").as("format"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"))
        .orderBy(col("doc_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        | md5(lower(hex(encode(text)))) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
