package graft.operators

import graft.TestSpark
import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the monster-bucket guard on the banded MinHash / SimHash-chunk
  * self-joins (VERDICT r12 item 3, [[Dedup.capBuckets]]):
  *
  *   1. ACTIVE guard, bounded volume: with the cap forced below a
  *      planted boilerplate cluster's size, every one of that cluster's
  *      band buckets is dropped and the surviving candidate volume obeys
  *      Σ |bucket|² over buckets of size ≤ cap.
  *   2. RECALL on the non-boilerplate class: every planted near-dup pair
  *      OUTSIDE the monster cluster is still generated as a candidate —
  *      a true pair is lost only if every band it shares is monster,
  *      i.e. only boilerplate shared by > cap docs (owned by q40/q150).
  *   3. The driver fixtures sit far below the default cap (1000), so the
  *      guard is a no-op on the gated corpora: q42/q96's oracles stay
  *      exact-Jaccard-complete there (regression canary for the margin).
  *   4. Plan shape: the occupancy window rides the same hash
  *      partitioning as the self-join — no Exchange ever sits ABOVE the
  *      Window on the way into the join.
  */
class MinhashBucketCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** q42's band fan-out over an in-memory (doc_id, text) corpus. */
  private def bandsOf(docs: Seq[(Long, String)]): DataFrame =
    docs.toDF("doc_id", "text").as[(Long, String)]
      .map { case (id, t) =>
        (id, TextHash.shingles(t.split(" ", -1).toSeq, 3).toSeq) }
      .flatMap { case (id, sh) =>
        TextHash.bands(TextHash.minhash(sh)).iterator.zipWithIndex
          .map { case (v, i) => (id, i, v) } }
      .toDF("doc_id", "band_idx", "band_val")

  private def withCap[T](cap: Int)(body: => T): T = {
    val key = "spark.graft.lsh.bucketCap"
    val prev = spark.conf.getAll.get(key)
    spark.conf.set(key, cap.toString)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  // deterministic synthetic corpus: a 35-doc boilerplate cluster (all
  // IDENTICAL text -> identical minhash -> 32 shared monster buckets),
  // 8 planted near-dup pairs with disjoint vocabularies, and noise docs
  private val boiler = (0L until 35L).map(i =>
    i -> "legal disclaimer repeated across every page of the crawl domain " * 3)
  private val planted = (0 until 8).flatMap { p =>
    val words = (0 until 40).map(w => s"p${p}w$w").mkString(" ")
    val nearDup = (0 until 40).map(w =>
      if (w == 39) "changed" else s"p${p}w$w").mkString(" ")
    Seq((100L + 2 * p) -> words, (101L + 2 * p) -> nearDup)
  }
  private val noise = (0 until 20).map(i =>
    (200L + i) -> (0 until 30).map(w => s"n${i}x$w").mkString(" "))
  private val corpus = boiler ++ planted ++ noise

  test("cap drops monster buckets and bounds candidate volume") {
    val bands = bandsOf(corpus)
    withCap(20) {
      val kept = Dedup.capBuckets(spark, bands, Seq("band_idx", "band_val"))
      // guard ACTIVE: every boilerplate band bucket (occupancy 35 > 20)
      // is gone; the planted/noise docs' buckets survive
      assert(kept.filter(col("doc_id") < 100).count() === 0,
        "monster-cluster rows must be dropped")
      assert(kept.filter(col("doc_id") >= 100).count() ===
        bands.filter(col("doc_id") >= 100).count(),
        "small buckets must be untouched")
      val maxKept = kept.groupBy("band_idx", "band_val")
        .agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
      assert(maxKept <= 20, s"surviving occupancy $maxKept exceeds the cap")
    }
  }

  test("planted non-boilerplate pairs all survive an aggressive cap") {
    withCap(20) {
      val kept = Dedup.capBuckets(spark, bandsOf(corpus),
        Seq("band_idx", "band_val"))
      val cand = kept.select(col("doc_id").as("id_a"), col("band_idx"),
          col("band_val"))
        .join(kept.select(col("doc_id").as("id_b"), col("band_idx"),
          col("band_val")), Seq("band_idx", "band_val"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (p <- 0 until 8)
        assert(cand.contains((100L + 2 * p, 101L + 2 * p)),
          s"planted pair $p lost under the cap")
    }
  }

  test("driver fixture occupancy sits far below the default cap (guard is a no-op on gated corpora)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val occ = bandsOf(docs).groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    assert(occ < 1000,
      s"fixture band occupancy $occ reaches the default cap — q42's " +
        "exact-completeness oracle would silently lose recall")
  }

  test("occupancy window shares the self-join's partitioning (no exchange above the window)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    val bands = bandsOf(corpus)
    val kept = Dedup.capBuckets(spark, bands, Seq("band_idx", "band_val"))
    val q = kept.select(col("doc_id").as("id_a"), col("band_idx"),
        col("band_val"))
      .join(kept.select(col("doc_id").as("id_b"), col("band_idx"),
        col("band_val")), Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
    q.collect() // finalize AQE
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      p +: kids.flatMap(all)
    }
    val nodes = all(q.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[WindowExec]), "no window in plan")
    val windowAboveExchange = nodes.collect {
      case e: ShuffleExchangeLike if all(e).exists(_.isInstanceOf[WindowExec]) => e
    }
    assert(windowAboveExchange.isEmpty,
      s"window output re-shuffles before the join:\n${q.queryExecution.executedPlan}")
  }
}
