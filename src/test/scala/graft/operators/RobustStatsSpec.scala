package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Golden pins for the round-11 statistics operators: each scalable
  * formulation (value-count frames, contingency-table ranks,
  * postings-bounded scoring) must agree with an independent brute-force
  * computation collected on the driver. The queries' DuckDB oracles pin
  * cross-engine parity; these pins catch a future refactor that breaks
  * the MATH while staying self-consistent across engines.
  */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q211 winsorized bounds match driver-side R-7 percentiles") {
    val rows = SparkEntry.queries("q211_winsorized_stats")(spark, sf).collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    for (row <- rows) {
      val seg = row.getString(0)
      val vs = cust(seg).map(_._2).sorted
      val n = vs.length
      assert(row.getLong(1) === n.toLong, s"$seg n")
      // reference R-7: pos = (n-1)p, linear interpolation — here exactly
      // as the integer formula the operator claims to implement
      def r7(p5: Long): Double = {
        val k = ((n - 1) * p5 / 100).toInt
        val r = (n - 1) * p5 % 100
        val hi = if (k + 1 < n) vs(k + 1) else vs(k)
        (vs(k) * (100 - r) + hi * r) / 10000.0
      }
      assert(math.abs(row.getDouble(2) - r7(5)) < 1e-9, s"$seg p05")
      assert(math.abs(row.getDouble(3) - r7(95)) < 1e-9, s"$seg p95")
      // winsorized mean from the same driver-side reference
      val b05 = r7(5) * 10000.0
      val b95 = r7(95) * 10000.0
      val wsum = vs.map(v => math.max(math.min(v * 100.0, b95), b05)).sum
      val wmean = BigDecimal(wsum / n / 10000.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getDouble(4) - wmean) < 1e-9, s"$seg wmean")
    }
  }

  test("q212 Spearman matches brute-force average-rank Pearson") {
    val rows = SparkEntry.queries("q212_spearman")(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1)
    assert(rows.length === li.size)
    def avgRanks(xs: Array[Long]): Array[Double] = {
      // average rank among ties, 1-based — the textbook definition the
      // contingency-table cumsum formula claims to reproduce
      val sortedIdx = xs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](xs.length)
      var i = 0
      while (i < sortedIdx.length) {
        var j = i
        while (j + 1 < sortedIdx.length &&
          sortedIdx(j + 1)._1 == sortedIdx(i)._1) j += 1
        val avg = (i + j + 2) / 2.0 // mean of 1-based positions i+1..j+1
        for (k <- i to j) out(sortedIdx(k)._2) = avg
        i = j + 1
      }
      out
    }
    def pearson(x: Array[Double], y: Array[Double]): Double = {
      val n = x.length.toDouble
      val sx = x.sum; val sy = y.sum
      val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    for (row <- rows) {
      val flag = row.getString(0)
      val g = li(flag)
      assert(row.getLong(1) === g.size.toLong, s"$flag n")
      val rho = pearson(avgRanks(g.map(_._2).toArray),
        avgRanks(g.map(_._3).toArray))
      assert(math.abs(row.getDouble(2) - rho) < 1e-5, s"$flag rho")
    }
  }

  test("q217 MAD matches a naive sort-based median-of-deviations") {
    val rows = SparkEntry.queries("q217_mad_robust_spread")(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
      .groupBy(_._1)
    assert(rows.length === li.size)
    // reference R-7 median on a plain sorted array, ×100 to stay exact
    def med100(xs: Array[Long]): Long = {
      val vs = xs.sorted
      val n = vs.length
      val k = ((n - 1) * 50 / 100).toInt
      val r = (n - 1) * 50 % 100
      val hi = if (k + 1 < n) vs(k + 1) else vs(k)
      vs(k) * (100 - r) + hi * r
    }
    for (row <- rows) {
      val g = li(row.getString(0)).map(_._2).toArray
      assert(row.getLong(1) === g.length.toLong)
      val m100 = med100(g)
      assert(row.getDouble(2) === m100 / 100.0, "median")
      val mad10000 = med100(g.map(v => math.abs(v * 100 - m100)))
      assert(row.getDouble(3) === mad10000 / 10000.0, "mad")
    }
  }

  test("q216 negative sample matches a driver-side re-derivation") {
    val rows = SparkEntry.queries("q216_negative_sampling")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = docs.size.toLong
    val mod = 1000000000000000L
    def rh(key: String): Long =
      key.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % mod)
    val expected = docs.keys.toSeq.sorted.filter(_ % 50 == 0).flatMap { a =>
      (1 to 4).flatMap { j =>
        val negId = rh(s"neg|$a|$j|graft-negsample-v1") % n
        docs.get(negId) match {
          case Some(src) if src != docs(a) => Some((a, j, negId, src))
          case _ => None
        }
      }
    }
    assert(rows.toSeq === expected,
      "hash-seeded sample must be exactly re-derivable")
  }

  test("q210 BM25 matches a driver-side reference scorer") {
    val rows = SparkEntry.queries("q210_bm25_topk")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val qTerms = Seq("hash", "join", "scan")
    val nDocs = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum / nDocs
    val df = qTerms.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    val scored = docs.flatMap { case (id, toks) =>
      val terms = qTerms.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5))
          val s = idf * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
          Some(BigDecimal(s).setScale(12,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      if (terms.isEmpty) None
      else Some((id, terms.length.toLong, BigDecimal(terms.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val top = scored.sortBy { case (id, _, s) => (-s, id) }.take(20)
    assert(rows.length === top.length)
    rows.zip(top).foreach { case (row, (id, nt, s)) =>
      assert(row.getLong(0) === id, "doc order")
      assert(row.getLong(1) === nt, s"doc $id n_terms")
      assert(math.abs(row.getDouble(2) - s) < 1e-9, s"doc $id score")
    }
  }

  test("q227 Mann-Whitney matches a driver-side brute-force rank test") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("q227_mann_whitney")(spark, sf).head()
    val xs = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select((col("event_type") === "click").as("is1"),
        round(col("value") * 100).cast("long").as("vc"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val n1 = xs.count(_._1).toLong
    val n2 = xs.length - n1
    // brute-force average ranks over the raw sorted sample
    val sorted = xs.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1L).sum.toDouble / g.length) }
    val r1 = xs.filter(_._1).map(t => rankOf(t._2)).sum
    val u1 = r1 - n1.toDouble * (n1 + 1) / 2
    val n = (n1 + n2).toDouble
    val tieTerm = sorted.groupBy(identity).values
      .map(g => math.pow(g.length.toDouble, 3) - g.length).sum
    val sigma = math.sqrt(n1.toDouble * n2 / 12.0 *
      ((n + 1) - tieTerm / (n * (n - 1))))
    val z = (u1 - n1.toDouble * n2 / 2.0) / sigma
    assert(row.getLong(0) === n1)
    assert(row.getLong(1) === n2)
    assert(math.abs(row.getDouble(2) - u1) < 1e-6, "u1")
    assert(math.abs(row.getDouble(3) - z) < 1e-5, "z")
    assert(row.getBoolean(4) === (math.abs(z) > 1.959964), "significant")
  }

  test("q228 rolling median/MAD flags match a driver-side re-derivation") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q228_rolling_anomaly")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6))).toMap
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    var checked = 0
    for ((et, g) <- daily) {
      val series = g.sortBy(_._2)
      for (i <- series.indices.drop(7)) {
        val (_, day, n) = series(i)
        val arr = series.slice(i - 7, i).map(_._3)
        val med = arr.sorted.apply(3)
        val mad = arr.map(v => math.abs(v - med)).sorted.apply(3)
        val (gn, gmed, gmad, ganom) = rows((et, day))
        assert(gn === n && gmed === med && gmad === mad, s"$et $day")
        val anom = if (mad == 0) n != med
          else math.abs((n - med).toDouble / (1.4826 * mad)) > 3.5
        assert(ganom === anom, s"$et $day anomaly")
        checked += 1
      }
    }
    assert(checked === rows.size, "every emitted row re-derived")
  }

  test("q224 OHLC argmin/argmax picks match an explicit per-bar sort") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q224_ohlc_bars")(spark, sf).collect()
    val ticks = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    assert(rows.length === ticks.size)
    for (row <- rows) {
      val bar = ticks((row.getString(0), row.getString(1)))
        .sortBy(t => (t._1, t._2)) // the total order the aggregate claims
      assert(row.getDouble(2) === bar.head._3, "open = first tick by (us, id)")
      assert(row.getDouble(3) === bar.map(_._3).max, "high")
      assert(row.getDouble(4) === bar.map(_._3).min, "low")
      assert(row.getDouble(5) === bar.last._3, "close = last tick by (us, id)")
      assert(row.getLong(6) === bar.length.toLong, "n_events")
      val mean = bar.map(_._3).sum / bar.length
      assert(math.abs(row.getDouble(7) - mean) < 1e-6, "avg_value")
    }
  }
}
