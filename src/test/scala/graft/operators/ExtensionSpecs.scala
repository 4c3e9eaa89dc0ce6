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

  test("q286 IDENTIFIER binding refuses non-identifier (injection) values") {
    graft.sources.Tables.customer(spark, sf)
      .createOrReplaceTempView("graft_cust286s")
    val template = "SELECT count(*) AS n FROM IDENTIFIER(:tbl)"
    assert(spark.sql(template, Map("tbl" -> "graft_cust286s"))
      .head().getLong(0) > 0)
    // a bound "table name" carrying SQL never parses as an identifier —
    // the template cannot be escaped through the parameter
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(template,
        Map("tbl" -> "graft_cust286s WHERE 1=0 --")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(template,
        Map("tbl" -> "nonexistent_tbl; DROP VIEW graft_cust286s")).collect()
    }
    // the view survived the attempts
    assert(spark.catalog.tableExists("graft_cust286s"))
    spark.catalog.dropTempView("graft_cust286s")
  }

  test("q25 gate verifies itself: exact count matches q24, within_bound true") {
    // q25's gated frame carries (exact_parts, within_bound) — cross-check
    // the exact side against q24's independent computation and assert the
    // self-verification verdict.
    val rows = run("q25_approx_distinct").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val exact = run("q24_distinct_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val (e, ok) = rows(flag)
      assert(e == n, s"$flag: q25 exact_parts=$e vs q24=$n")
      assert(ok, s"$flag: HLL drifted past the 5% bound")
    }
  }

  test("q48 LSH ANN finds a usable fraction of true neighbors (recall@5)") {
    val truth = run("q46_ann_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTop5(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (truth & lsh).size.toDouble / truth.size
    // hyperplane LSH (16 tables × 6 bits) on weakly-correlated synthetic
    // vectors: the floor guards against the bucketing silently
    // degenerating (recall≈0) or the candidate set degenerating to the
    // full corpus. Same floor as the gated q48's self-check.
    assert(recall >= Similarity.LshRecallFloor, s"recall@5 = $recall")
    assert(lsh.nonEmpty)
    // and the gated summary frame must agree with the recomputation
    val gate = run("q48_ann_lsh").collect()
    assert(gate.length == 1 && gate(0).getBoolean(3),
      s"q48 gate row disagrees: ${gate.mkString}")
  }

  test("LSH/minhash/simhash are deterministic across invocations") {
    def fingerprint(name: String): Seq[String] =
      run(name).collect().map(_.toString).toSeq
    for (q <- Seq("q42_minhash_lsh", "q43_simhash")) {
      assert(fingerprint(q) === fingerprint(q), q)
    }
    def lshFp(): Seq[String] =
      Similarity.lshTop5(spark, sf).collect().map(_.toString).toSeq
    assert(lshFp() === lshFp(), "lshTop5")
  }

  test("minhash-LSH finds exactly the planted near-dup pairs (= exact jaccard)") {
    val lsh = run("q42_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("q44_ngram_jaccard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty) // 28 planted pairs at sf0.001, 25 at sf0.01
  }
}
