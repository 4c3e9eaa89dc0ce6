package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the tiled exact cosine self-join: for ANY corpus and
  * ANY tile count it must emit exactly the brute-force pair set — the
  * tiling algebra (i ≤ j tile pairs, diagonal both-orders dedup,
  * off-diagonal single emission) is where a silent pair loss or
  * duplication would hide.
  */
class TiledJoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def randomCorpus(n: Int, dim: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
  }

  private def bruteForce(e0: org.apache.spark.sql.DataFrame, t: Double) = {
    val e = e0.withColumn("nrm",
      sqrt(graft.functions.VectorFunctions.dot(spark, "v", "v")))
    val a = e.toDF("id_a", "v_a", "nrm_a")
    val b = e.toDF("id_b", "v_b", "nrm_b")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(
        graft.functions.VectorFunctions.dot(spark, "v_a", "v_b") /
          (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= t)
      .select("id_a", "id_b", "cos")
  }

  test("tiled join equals brute force for every tile count") {
    // low threshold + low dim → plenty of qualifying pairs to lose
    val corpus = randomCorpus(n = 80, dim = 8, seed = 42)
    val expected = bruteForce(corpus, 0.2)
      .collect().map(_.toString).sorted
    assert(expected.nonEmpty, "test corpus must produce qualifying pairs")
    for (tiles <- Seq(1, 2, 3, 8, 17)) {
      val got = Dedup.cosinePairsTiled(spark, corpus, 0.2, tiles)
        .collect().map(_.toString).sorted
      assert(got === expected, s"tiles=$tiles diverged from brute force")
    }
  }
}
