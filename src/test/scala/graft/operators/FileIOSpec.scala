package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Gate-level checks for the file-input MapReduce queries and the sink
  * round-trip (FileIO pack). The DuckDB oracle is the real arbiter; these
  * pin the Spark-side invariants that the oracle can't see: header-skip
  * correctness (a swallowed header would surface as a phantom group) and
  * sink round-trip identity (the intersected read-back must equal the
  * in-memory aggregate, not merely be non-empty).
  */
class FileIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q74 header line is skipped, groups match the table") {
    val got = SparkEntry.queries("q74_mr_textfile")(spark, sf).collect()
    val expected = graft.sources.Tables.customer(spark, sf)
      .groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("c_name").as("first_name"))
      .orderBy("c_mktsegment").collect()
    assert(got.toSeq === expected.toSeq)
    // no phantom group from the header line
    assert(!got.exists(_.getString(0) == "c_mktsegment"))
  }

  test("q75 file index covers every shard") {
    val got = SparkEntry.queries("q75_mr_file_index")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    assert(got === graft.sources.Tables.orders(spark, sf).count())
  }

  test("q76 sink round-trip equals the direct aggregate") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q76_sink_roundtrip")(spark, sf)
      .collect().map(_.toString).sorted
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_qty"),
        count(lit(1)).as("n"))
      .collect().map(_.toString).sorted
    assert(got.length === 3)
    assert(got === direct)
  }

  test("q86 scan prunes to the filtered day partitions") {
    val df = SparkEntry.queries("q86_partitioned_scan")(spark, sf)
    df.collect() // materializes the partitioned layout
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = formatted.split("\n").filter(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("2024-01-08") && l.contains("day#")),
      s"expected the day range inside PartitionFilters, got:\n${pf.mkString("\n")}")
  }

  test("q77 bucketed join plans without a shuffle on either join key") {
    val df = SparkEntry.queries("q77_bucketed_join")(spark, sf)
    df.collect() // also materializes the bucketed tables
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"unexpected shuffle before bucketed join:\n$plan")
  }
}
