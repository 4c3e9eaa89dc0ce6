package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle.
  *
  * `fn(spark, sfDir)` must return a deterministic DataFrame (stable row
  * order, rounded doubles) whose column names match the oracle's aliases
  * exactly — the driver's compare sorts columns by name before hashing.
  * `oracle` is ANSI-ish SQL runnable by DuckDB against the same parquet
  * tables (registered under their bare table names). `None` means the
  * driver falls back to a rows-only check (used for probabilistic or
  * non-SQL-expressible operators).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A themed group of queries; SparkEntry concatenates all packs. */
trait QueryPack {
  def queries: Seq[Q]
}
