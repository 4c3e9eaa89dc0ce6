package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the splitting/packing operators, beyond the oracle:
  * the properties a training pipeline actually relies on.
  */
class PipelineSplitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q80 never splits a near-dup component across splits") {
    val df = SparkEntry.queries("q80_leakage_safe_split")(spark, sf)
    val leaky = df.groupBy("component")
      .agg(countDistinct("split").as("k"))
      .filter(col("k") > 1)
      .count()
    assert(leaky === 0L)
  }

  test("q79 split fractions are near 80/10/10") {
    val counts = SparkEntry.queries("q79_hash_split")(spark, sf)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0L)
  }

  test("q81 bins respect the budget except for oversized single docs") {
    // a bin may exceed 4096 only via its FIRST (largest) doc; any bin
    // with more than one doc was closed before adding the overflow doc,
    // so multi-doc bins stay under budget + largest-doc slack
    val over = SparkEntry.queries("q81_packing_bins")(spark, sf)
      .filter(col("n_docs") > 1 && col("n_chars") > 4096 * 2)
      .count()
    assert(over === 0L)
  }
}
