package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries read through here so scan behavior (and any future
  * source-level options) is centralized. Parquet + Catalyst give column
  * pruning and predicate pushdown for free — the 100 TB design relies on
  * every query only scanning the columns/row groups it needs, so query
  * code must `select` early and filter with Column predicates.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark refuses outright
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via the legacy flag and
    * floor-divide to a microsecond TimestampType (`div`, not `/` — double
    * division would lose precision on ns-since-epoch magnitudes). DuckDB
    * keeps full ns; queries must not emit raw `ts` values, only derived
    * fields at ≥second granularity (months, epochs, diffs).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
