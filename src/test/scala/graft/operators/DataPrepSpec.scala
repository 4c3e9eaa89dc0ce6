package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-side invariants for the DataPrep pack (q88–q95). The DuckDB
  * oracle is the arbiter of exact values; these pin the semantic
  * properties a value-hash can't express: chunk coverage/overlap, full
  * redaction, split monotonicity of the funnel, and per-key uniqueness
  * of the compaction.
  */
class DataPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q88 chunks cover every token with stride-6 windows") {
    val chunks = SparkEntry.queries("q88_chunk_overlap")(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    // chunk count per doc = floor((n_tok-1)/stride)+1, indices contiguous,
    // no chunk exceeds the window, and some chunk reaches the final token
    // (stride < window makes inner coverage gap-free by construction)
    val agg = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_idx").as("max_idx"),
        max(col("chunk_idx") * 6 + col("n_tokens")).as("reach"),
        max("n_tokens").as("max_len"), min("n_tokens").as("min_len"))
      .join(docs, "doc_id")
    val bad = agg.filter(
      col("n_chunks") =!= floor((col("n_tok") - 1) / 6) + 1 ||
      col("max_idx") =!= col("n_chunks") - 1 ||
      col("reach") =!= col("n_tok") ||
      col("max_len") > 8 || col("min_len") < 1)
    assert(bad.count() === 0)
  }

  test("q89 leaves no multi-digit run unredacted and counts them") {
    val got = SparkEntry.queries("q89_pii_redact")(spark, sf)
    assert(got.filter(col("props_redacted").rlike("[0-9]{2,}")).count() === 0)
    // counted occurrences must equal the number of <NUM> masks inserted
    val bad = got.filter(
      size(split(col("props_redacted"), "<NUM>", -1)) - 1 =!= col("n_redacted"))
    assert(bad.count() === 0)
  }

  test("q90 keeps all English docs and subsets of the rest") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val kept = SparkEntry.queries("q90_mixture_sample")(spark, sf)
    val en = docs.filter(col("lang") === "en").count()
    assert(kept.filter(col("lang") === "en").count() === en)
    // per-language keep counts never exceed the corpus counts, and the
    // aggressive-downsample languages (es 1/4, zh 1/8) keep strictly less
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allBy = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, n) <- keptBy) assert(n <= allBy(l), s"lang $l")
    for (l <- Seq("es", "zh") if allBy.contains(l))
      assert(keptBy.getOrElse(l, 0L) < allBy(l), s"lang $l not downsampled")
  }

  test("q91 emits one row per user carrying that user's max timestamp") {
    val got = SparkEntry.queries("q91_upsert_latest")(spark, sf)
    assert(got.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    val maxTs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id").agg(max("us").as("mx"))
    val bad = got.join(maxTs, "user_id").filter(col("last_ts_us") =!= col("mx"))
    assert(bad.count() === 0)
  }

  test("q93 centroid groups count every vector exactly once per position") {
    val got = SparkEntry.queries("q93_cluster_centroids")(spark, sf)
    val perLabel = graft.sources.Tables.embeddings(spark, sf)
      .groupBy("label").count()
    // each label must have exactly 64 positions, each counting that
    // label's full vector population
    val bad = got.groupBy("label")
      .agg(count(lit(1)).as("n_pos"), min("n").as("mn"), max("n").as("mx"))
      .join(perLabel, "label")
      .filter(col("n_pos") =!= 64 || col("mn") =!= col("count") ||
        col("mx") =!= col("count"))
    assert(bad.count() === 0)
  }

  test("q94 histogram partitions the corpus") {
    val got = SparkEntry.queries("q94_length_histogram")(spark, sf).collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(got.map(_.getLong(1)).sum === total)
    assert(got.forall { r => val b = r.getLong(0); b >= 0 && b < 16 })
    // bucket ranges must not overlap: max_chars of bucket i < min_chars of i+1
    val sorted = got.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ => ()
    }
  }

  test("q95 funnel is monotone non-increasing") {
    val got = SparkEntry.queries("q95_filter_funnel")(spark, sf)
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(got.length === 5)
    got.sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ => ()
    }
    assert(got.head === graft.sources.Tables.documents(spark, sf).count())
  }

  test("q111 two-level top-k equals the naive single-window rank") {
    import org.apache.spark.sql.expressions.Window
    val quota = 40
    val naive = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= quota)
      .select("doc_id", "source", "rk")
    val got = SparkEntry.queries("q111_stratified_quota")(spark, sf)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "two-level quota sample diverges from the single-window rank")
    // and each stratum is exactly min(quota, stratum size)
    val sizes = graft.sources.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy("source").count().collect().foreach { r =>
      assert(r.getLong(1) == math.min(quota.toLong, sizes(r.getString(0))))
    }
  }

  test("q215 DP release: suppression branch, determinism, Laplace shape") {
    import spark.implicits._
    // the driver fixtures' cells all clear τ = 20, so the suppression
    // branch is pinned here on synthetic cells straddling the threshold
    val cells = Seq(("tiny", 3L), ("small", 15L), ("big", 1000L))
      .toDF("label", "n")
    val noisy = cells.withColumn("noise",
      DataPrep.dpLaplace(concat_ws("|", col("label"), lit("graft-dp-v1")), 2.0))
      .withColumn("released", col("n") + col("noise") >= 20.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(!noisy("tiny")._2, "a count of 3 must be suppressed at tau=20")
    assert(noisy("big")._2, "a count of 1000 must be released at tau=20")
    // determinism: same key -> bit-identical noise on a fresh plan
    val again = cells.withColumn("noise",
      DataPrep.dpLaplace(concat_ws("|", col("label"), lit("graft-dp-v1")), 2.0))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    noisy.foreach { case (k, (v, _)) => assert(again(k) == v, s"$k noise") }
    // Laplace(b=2) sanity over many keys: |noise| has mean ~b and the
    // sign is ~balanced (inverse-CDF over an approximately uniform hash)
    val sample = spark.range(2000)
      .withColumn("noise", DataPrep.dpLaplace(
        concat_ws("|", col("id").cast("string"), lit("graft-dp-v1")), 2.0))
      .select("noise").as[Double].collect()
    val meanAbs = sample.map(math.abs).sum / sample.length
    assert(meanAbs > 1.4 && meanAbs < 2.6, s"mean |noise| = $meanAbs, want ~2")
    val pos = sample.count(_ > 0).toDouble / sample.length
    assert(pos > 0.4 && pos < 0.6, s"positive fraction $pos, want ~0.5")
  }

  test("q223 feature hashing matches a driver-side re-derivation") {
    val rows = SparkEntry.queries("q223_feature_hashing")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
    graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().foreach { r =>
        val id = r.getLong(0)
        r.getString(1).split(" ", -1).foreach { tok =>
          val h = hex("fh:" + tok)
          val idx = java.lang.Long.parseLong(h.substring(0, 8), 16) % 64
          val sgn = if (h.charAt(8) < '8') 1L else -1L
          expected((id, idx)) = expected.getOrElse((id, idx), 0L) + sgn
        }
      }
    assert(rows === expected.toMap,
      "hash-trick weights must be exactly re-derivable per token")
  }

  test("q231 label index is dense, frequency-ordered, and total") {
    val rows = SparkEntry.queries("q231_label_encoding")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs, "every doc must be encoded")
    val dict = rows.map(t => (t._2, t._3, t._4)).distinct.sortBy(_._2)
    // indices are exactly 0..k-1 with counts non-increasing (ties lexical)
    assert(dict.map(_._2).toSeq === dict.indices.toSeq)
    for (w <- dict.sliding(2) if w.length == 2) {
      val (a, b) = (w(0), w(1))
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1),
        s"order violated between ${a._1} and ${b._1}")
    }
    assert(dict.map(_._3).sum === nDocs, "dictionary counts must total N")
  }
}
