package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries. Each query takes
  * (session, scale-factor dir) and returns a deterministic DataFrame; each
  * key with an `oracle` entry is hash-compared by the driver against DuckDB
  * running the same SQL over the same parquet tables (TESTDATA.md). Keys
  * without an oracle entry get a weaker rows>0 check.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
