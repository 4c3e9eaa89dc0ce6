package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Golden ports of the reference's unit tests (mapreduce_unittest.py:13-70)
  * plus semantics pins the reference leaves implicit (SURVEY.md §5.2).
  */
class MapReduceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The reference's golden vector (mapreduce_unittest.py:19-27): per
    * k = x mod 9, max of x² over x in 0..999. */
  val golden: Seq[(Long, Long)] = Seq(
    0L -> 998001L, 1L -> 982081L, 2L -> 984064L, 3L -> 986049L,
    4L -> 988036L, 5L -> 990025L, 6L -> 992016L, 7L -> 994009L,
    8L -> 996004L)

  def maxSquares(ds: org.apache.spark.sql.Dataset[java.lang.Long],
      parts: Option[Int]): Seq[(Long, Long)] = {
    import spark.implicits._
    MapReduce.run[java.lang.Long, Long, Long, (Long, Long)](
      ds,
      x => Iterator((x % 9L, x * x)),
      (k, vs) => (k, vs.max),
      parts)
      .collect().toSeq.sortBy(_._1)
  }

  test("bulk API matches reference golden output (test_simple/test_mr)") {
    assert(maxSquares(spark.range(1000).as("x").map(identity)(
      org.apache.spark.sql.Encoders.LONG), None) === golden)
  }

  test("explicit reducer count reproduces reference topology (4 reducers)") {
    assert(maxSquares(spark.range(1000).map(identity)(
      org.apache.spark.sql.Encoders.LONG), Some(4)) === golden)
  }

  test("string keys work (the reference's sharder was str-only)") {
    import spark.implicits._
    val out = MapReduce.run[java.lang.Long, String, Long, (String, Long)](
      spark.range(100).map(identity)(org.apache.spark.sql.Encoders.LONG),
      x => Iterator(("k" + (x % 3L), x)),
      (k, vs) => (k, vs.sum))
      .collect().toSeq.sortBy(_._1)
    val exp = (0L until 100L).groupBy(x => "k" + (x % 3))
      .map { case (k, vs) => (k, vs.sum) }.toSeq.sortBy(_._1)
    assert(out === exp)
  }

  test("holistic reduce sees the complete value group (median + concat)") {
    import spark.implicits._
    val data = Seq((1, 5.0), (1, 1.0), (1, 3.0), (2, 8.0), (2, 2.0))
    val out = MapReduce.run[(Int, Double), Int, Double, (Int, Double, String)](
      spark.createDataset(data),
      kv => Iterator(kv),
      (k, vs) => {
        val sorted = vs.toSeq.sorted // holistic: materialize the group
        (k, sorted(sorted.size / 2), sorted.mkString(","))
      })
      .collect().toSeq.sortBy(_._1)
    assert(out === Seq((1, 3.0, "1.0,3.0,5.0"), (2, 8.0, "2.0,8.0")))
  }

  test("fan-out mapper: 0..n outputs per input (generator contract)") {
    import spark.implicits._
    val out = MapReduce.run[java.lang.Long, Long, Long, (Long, Long)](
      spark.range(10).map(identity)(org.apache.spark.sql.Encoders.LONG),
      x => if (x % 2 == 0) Iterator((x, x), (x, x * x)) else Iterator.empty,
      (k, vs) => (k, vs.sum))
      .collect().toSeq.sortBy(_._1)
    assert(out === Seq(0L -> 0L, 2L -> 6L, 4L -> 20L, 6L -> 42L, 8L -> 72L))
  }

  test("runAssociative equals holistic run for a commutative monoid") {
    import spark.implicits._
    val ds = spark.range(500).map(identity)(org.apache.spark.sql.Encoders.LONG)
    val assoc = MapReduce.runAssociative[java.lang.Long, Long, Long](
      ds, x => Iterator((x % 7L, x * x)), math.max)
      .collect().toSeq.sortBy(_._1)
    val holistic = maxSquares(spark.range(500).map(identity)(
      org.apache.spark.sql.Encoders.LONG), None)
    // different keyspaces (mod 7 vs mod 9) — recompute expected directly
    val exp = (0L until 500L).map(x => (x % 7L, x * x))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }
      .toSeq.sortBy(_._1)
    assert(assoc === exp)
    assert(holistic.size === 9)
  }
}
