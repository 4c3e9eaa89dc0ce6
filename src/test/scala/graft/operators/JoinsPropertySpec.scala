package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized pins for the custom join operators against brute-force
  * local oracles — the union+window as-of trick and the ±1-bucket band
  * join must agree with the naive O(n²) definition on arbitrary data.
  */
class JoinsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("leftAsOf ≡ brute-force latest-right-at-or-before, 5 random cases") {
    import spark.implicits._
    val rnd = new Random(7)
    for (caseNo <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(5)
      val left = List.fill(30 + rnd.nextInt(50))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong))
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      // right times unique per key (operator contract)
      val right = (0 until nKeys).flatMap { k =>
        rnd.shuffle((0 until 1000).toList).take(5 + rnd.nextInt(10))
          .map(t => (k.toLong, t.toLong, k * 10000L + t))
      }
      val lDf = left.toDF("lid", "k", "t")
      val rDf = right.toDF("rk", "rt", "payload")
      val got = AsOfJoin.leftAsOf(lDf, rDf, "k", "rk", col("t"), col("rt"))
        .select("lid", "payload")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val expected = left.map { case (lid, k, t) =>
        val cands = right.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got === expected, s"case $caseNo")
    }
  }

  test("bandedJoin ≡ brute-force |Δt| ≤ tol pairs, 5 random cases") {
    import spark.implicits._
    val rnd = new Random(11)
    for (caseNo <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(4)
      val tol = 50L + rnd.nextInt(100)
      val rows = List.fill(40 + rnd.nextInt(40))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(2000).toLong))
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val df = rows.toDF("id", "k", "t")
      val got = RangeJoin.bandedJoin(df, df, "k", "t", "t", tol)
        .filter(col("r_id").isNotNull && col("r_id") =!= col("id"))
        .select("id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        a <- rows; b <- rows
        if a._1 != b._1 && a._2 == b._2 && math.abs(a._3 - b._3) <= tol
      } yield (a._1, b._1)).toSet
      assert(got === expected, s"case $caseNo tol=$tol")
    }
  }
}
