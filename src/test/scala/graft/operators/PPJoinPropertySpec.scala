package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical soundness pin for the exact-Jaccard filter stack (prefix
  * index + length filter + PPJoin positional filter): on random corpora
  * from a TINY vocabulary — the adversarial regime where shingles are
  * hot, document frequencies tie constantly, and prefix boundaries sit
  * on the ceil edge — the filtered join must emit exactly the
  * brute-force pair set. A filter that over-prunes loses recall
  * silently; this is where it would surface first.
  */
class PPJoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Random docs from a small vocab + planted near-dup pairs (one token
    * substituted), so qualifying pairs exist at jaccard ≥ 0.7. */
  private def randomCorpus(n: Int, vocab: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      val len = 6 + rnd.nextInt(25)
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" "))
    }
    val dups = (0 until n / 4).map { j =>
      val (srcId, text) = base(rnd.nextInt(n))
      val w = text.split(" ", -1)
      w(rnd.nextInt(w.length)) = s"w${rnd.nextInt(vocab)}"
      ((n + j).toLong, w.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  private def bruteForce(sh: org.apache.spark.sql.DataFrame, t: Double) = {
    val a = sh.toDF("id_a", "sh_a")
    val b = sh.toDF("id_b", "sh_b")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= t)
      .select("id_a", "id_b", "jaccard")
  }

  test("filtered jaccard join equals brute force on adversarial corpora") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val corpus = randomCorpus(n = 120, vocab = 12, seed = seed)
      val sh = Dedup.shingleDocs(spark, corpus)
      val expected = bruteForce(sh, 0.7).collect().map(_.toString).sorted
      assert(expected.nonEmpty, s"seed=$seed produced no qualifying pairs")
      val got = Dedup.jaccardPairs(spark, sh, 0.7)
        .collect().map(_.toString).sorted
      assert(got === expected, s"seed=$seed filter stack diverged")
    }
  }

  test("incremental probe finds exactly the batch-touching brute-force pairs") {
    // the asymmetric (probeFilter) mode must emit every qualifying pair
    // with at least one member in the probe batch — and nothing else —
    // on the same adversarial corpora
    for (seed <- Seq(3L, 11L)) {
      val corpus = randomCorpus(n = 120, vocab = 12, seed = seed)
      val sh = Dedup.shingleDocs(spark, corpus)
      val expected = bruteForce(sh, 0.7)
        .filter(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
        .collect().map(_.toString).sorted
      assert(expected.nonEmpty, s"seed=$seed produced no batch-touching pairs")
      val got = Dedup.jaccardPairs(spark, sh, 0.7,
          probeFilter = Some(col("id_a") % 3 === 0))
        .collect().map(_.toString).sorted
      assert(got === expected, s"seed=$seed incremental probe diverged")
    }
  }
}
