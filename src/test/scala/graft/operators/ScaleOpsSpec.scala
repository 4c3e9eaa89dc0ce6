package graft.operators

import graft.{SparkEntry, TestSpark}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the cluster-scale pattern pack: the plan-shape claims each
  * scaladoc makes (pre-filter below the join, shuffle join on the salted
  * path) and the bit-exactness + locality contract of the Morton key.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q107 applies a codegen Bloom pre-filter on the fact side BELOW the join") {
    val df = SparkEntry.queries("q107_bloom_prefilter_join")(spark, sf)
    df.collect() // materialize THIS QueryExecution so AQE finalizes it
    // (count() would build a separate plan and leave this one initial)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // the bloom probe must sit under the join, attached to the lineitem
    // scan side — and it must be the native codegen expression, NOT a
    // ScalaUDF (a udf would force the probe scan out of whole-stage
    // codegen; VERDICT r9 blemish #2).
    val planStr = plan.toString
    val filterIdx = planStr.indexOf("graft_bloom_probe")
    val joinIdx = planStr.indexOf("Join")
    assert(filterIdx >= 0, s"no bloom probe filter in plan:\n$planStr")
    assert(joinIdx >= 0 && joinIdx < filterIdx,
      "bloom filter must be below (after, in tree print order) the join")
    assert(!planStr.contains("UDF") && !planStr.contains("ScalaUDF"),
      s"q107 plan must be udf-free:\n$planStr")
    // and the probe-side Filter participates in whole-stage codegen: in
    // simpleString a "*(n)" prefix marks nodes inside a codegen stage
    // (can't collect WholeStageCodegenExec nodes structurally here —
    // AQE's QueryStageExec is a leaf, so collect() won't descend)
    val probeInCodegen =
      """\*\(\d+\) Filter .*graft_bloom_probe""".r.findFirstIn(planStr)
    assert(probeInCodegen.nonEmpty,
      s"bloom probe filter must run inside WholeStageCodegen:\n$planStr")
  }

  test("q107 bloom pre-filter is selective but lossless") {
    val dims = Tables.part(spark, sf).filter(col("p_size") <= 3)
      .select("p_partkey")
    val keys = dims.collect().map(_.getLong(0)).toSet
    val bloom = dims.stat.bloomFilter("p_partkey", 1 << 15, 0.01)
    // no false negatives, ever
    keys.foreach(k => assert(bloom.mightContain(k)))
    // and the pass-through rate on the fact side is close to the true
    // match rate (fpp 1% of non-matching rows may leak through)
    val fact = Tables.lineitem(spark, sf).select("l_partkey").collect()
      .map(_.getLong(0))
    val trueMatches = fact.count(keys.contains)
    val bloomPass = fact.count(bloom.mightContain)
    assert(bloomPass >= trueMatches)
    assert(bloomPass <= trueMatches + (fact.length - trueMatches) * 0.05 + 10,
      s"bloom passes $bloomPass vs $trueMatches true matches on ${fact.length} rows")
  }

  test("bloom probe Columns survive unbounded deferred analysis (no registry)") {
    // Regression for ADVICE r11 (BloomExpressions ring): with the old
    // temp-function registry, building more than the ring's keep-window
    // (8) of probe Columns BEFORE analyzing any of their frames evicted
    // the oldest names; the first frame then failed analysis with
    // "undefined function". Direct expression-backed Columns have no
    // registry, so all N frames must analyze and each must probe its OWN
    // sketch (distinct pass counts prove no cross-binding).
    val fact = Tables.lineitem(spark, sf).select("l_partkey")
    val frames = (1 to 12).map { sz =>
      val dims = Tables.part(spark, sf).filter(col("p_size") <= sz)
      val bloom = dims.stat.bloomFilter("p_partkey", 1 << 15, 0.01)
      // build the Column now, analyze much later
      sz -> fact.filter(
        graft.functions.BloomFunctions.mightContain(spark, bloom, "l_partkey"))
    }
    val passes = frames.map { case (sz, f) => sz -> f.count() }
    // pass counts must be monotonically non-decreasing in the dim filter
    // width — a stale/evicted/cross-bound sketch breaks this ordering
    passes.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(a <= b) }
    assert(passes.head._2 < passes.last._2)
  }

  test("mortonCode bit-interleaves exactly (vs a bit-twiddling reference)") {
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (32768L, 32767L))
    val df = spark.createDataFrame(samples).toDF("x", "y")
      .withColumn("z", ScaleOps.mortonCode(col("x"), col("y")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
        s"morton(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("q108 buckets are tight rectangles in BOTH dimensions") {
    // 1024 top-level buckets = 5 high bits per dimension, so each bucket
    // spans at most 2^11 values of x and of y. This is the property that
    // makes z-ordered row-group stats prunable on either column.
    val rows = SparkEntry.queries("q108_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      val (minY, maxY) = (r.getLong(4), r.getLong(5))
      assert(maxX - minX < 2048, s"bucket ${r.getLong(0)} x-span too wide")
      assert(maxY - minY < 2048, s"bucket ${r.getLong(0)} y-span too wide")
    }
  }

  test("q110 takes the shuffled (not broadcast) join path") {
    val plan = SparkEntry.queries("q110_salted_skew_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must be a shuffled hash join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "broadcast would bypass the skew the salt is there to spread")
  }

  test("q110 salt spreads the hot key across all 16 salts") {
    val nSalt = 16
    val salted = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 4 < 3) // the hot-key rows only
      .select((shiftright(col("l_orderkey"), 2) % nSalt).as("salt"))
      .groupBy("salt").count().collect()
    assert(salted.length == nSalt, s"hot key present in ${salted.length}/16 salts")
    val counts = salted.map(_.getLong(1))
    assert(counts.max < counts.min * 3,
      s"salted partitions unbalanced: min=${counts.min} max=${counts.max}")
  }

  test("q225 bucketed skyline equals brute-force pairwise dominance") {
    val sky = SparkEntry.queries("q225_pareto_skyline")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("x"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pts.filter { case (_, x, n) =>
      !pts.exists { case (_, qx, qn) =>
        qx >= x && qn <= n && (qx > x || qn < n)
      }
    }.map { case (ck, x, n) => (ck, x, n) }.toSet
    assert(sky === expected, "skyline must be exactly the undominated set")
    assert(sky.size > 1, "fixture should yield a non-trivial frontier")
  }

  test("q226 offsets-based numbering equals the global sort order") {
    val rows = SparkEntry.queries("q226_global_row_number")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).toSeq === (1L to rows.length).toSeq,
      "rn must be dense 1..N with no gaps or duplicates")
    val sorted = rows.sortBy { case (k, p, _) => (-p, k) }
    assert(sorted.map(_._3).toSeq === (1L to rows.length).toSeq,
      "rn must follow (price desc, key) order exactly")
  }

  test("q226 big side joins by broadcast after one range exchange") {
    val df = SparkEntry.queries("q226_global_row_number")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      "global order must come from a range repartition")
    assert(plan.contains("BroadcastHashJoin"),
      "offsets must re-enter by broadcast, never a big-side shuffle join")
  }
}
