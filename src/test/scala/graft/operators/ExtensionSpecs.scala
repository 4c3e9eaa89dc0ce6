package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the operators the DuckDB oracle can't fully check:
  * approximate-distinct accuracy, LSH ANN recall, and determinism of the
  * seeded hash families across runs.
  */
class ExtensionSpecs extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q25 approx_count_distinct within 5% of exact") {
    val approx = run("q25_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = run("q24_distinct_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val a = approx(flag)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$flag: approx=$a exact=$n")
    }
  }

  test("q48 LSH ANN finds a usable fraction of true neighbors (recall@5)") {
    val truth = run("q46_ann_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = run("q48_ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (truth & lsh).size.toDouble / truth.size
    // hyperplane LSH (16 tables × 6 bits) on weakly-correlated synthetic
    // vectors: the floor guards against the bucketing silently
    // degenerating (recall≈0) or the candidate set degenerating to the
    // full corpus.
    assert(recall >= 0.4, s"recall@5 = $recall")
    assert(lsh.nonEmpty)
  }

  test("LSH/minhash/simhash are deterministic across invocations") {
    def fingerprint(name: String): Seq[String] =
      run(name).collect().map(_.toString).toSeq
    for (q <- Seq("q42_minhash_lsh", "q43_simhash", "q48_ann_lsh")) {
      assert(fingerprint(q) === fingerprint(q), q)
    }
  }

  test("minhash-LSH finds exactly the planted near-dup pairs (= exact jaccard)") {
    val lsh = run("q42_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("q44_ngram_jaccard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty) // 28 planted pairs at sf0.001, 25 at sf0.01
  }
}
