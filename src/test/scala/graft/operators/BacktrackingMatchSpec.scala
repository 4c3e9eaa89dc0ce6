package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q183's bounded backtracking sequence match against a third,
  * fully independent implementation: the actual java.util.regex engine
  * run over each (user, day) event-letter path. The production plan is
  * two windowed suffix scans (no regex anywhere); the DuckDB oracle is
  * RE2; this spec is Java's backtracking NFA — three engines, one
  * semantics (leftmost-first with backtracking).
  */
class BacktrackingMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q183 equals the java.util.regex leftmost-first reference") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(r => (r._1, r._2))

    val pat = java.util.regex.Pattern.compile("^(.*?)c(.*?)v(.*?)p")
    val expected = ev.flatMap { case ((user, day), rows) =>
      val ordered = rows.sortBy(r => (r._3, r._4))
      val path = ordered.map(_._5 match {
        case "click" => 'c'; case "view" => 'v'; case "purchase" => 'p'
        case _ => 'x'
      }).mkString
      val m = pat.matcher(path)
      if (!m.find()) None
      else {
        val a = m.group(1).length; val b = m.group(2).length
        val g = m.group(3).length
        Some((user, day) ->
          (ordered(a)._3, ordered(a + b + 1)._3, ordered(a + b + g + 2)._3))
      }
    }

    val got = graft.SparkEntry.queries("q183_backtracking_match")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("q183 retries from later anchors (the semantics q165 omits)") {
    // hand fixture: first click has a view after it but no purchase
    // after that view; a later click completes. q165-style first-click
    // anchoring would report no match; backtracking must find the
    // second click. Path: c v c v p → match anchors at the FIRST c
    // (regex backtracking keeps the first anchor alive via the later v);
    // path c v p with p BEFORE the first c's v exercises anchor retry.
    import spark.implicits._
    val pat = java.util.regex.Pattern.compile("^(.*?)c(.*?)v(.*?)p")
    for (path <- Seq("cvp", "cpvcvp", "vcpcvp", "ccvvpp", "cvcv", "pvc")) {
      val m = pat.matcher(path)
      val expect =
        if (m.find())
          Some((m.group(1).length,
            m.group(1).length + m.group(2).length + 1,
            m.group(1).length + m.group(2).length + m.group(3).length + 2))
        else None
      // replay the plan's formulation in miniature on one partition
      val rows = path.zipWithIndex.map { case (ch, i) =>
        val t = ch match {
          case 'c' => "click"; case 'v' => "view"; case 'p' => "purchase"
          case _ => "other"
        }
        (1L, "2024-01-01", i.toLong, i.toLong, t)
      }
      val df = rows.toDF("user_id", "day", "us", "event_id", "event_type")
      df.createOrReplaceTempView("graft_bt_fixture")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "day")
        .orderBy(col("us").desc, col("event_id").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val withP = df.withColumn("next_p",
        min(when(col("event_type") === "purchase",
          struct(col("us"), col("event_id")))).over(w))
      val withV = withP.withColumn("next_vp",
        min(when(col("event_type") === "view" && col("next_p").isNotNull,
          struct(col("us"), col("event_id"),
            col("next_p.us").as("p_us")))).over(w))
      val got = withV
        .filter(col("event_type") === "click" && col("next_vp").isNotNull)
        .groupBy("user_id", "day")
        .agg(min(struct(col("us").as("c_us"), col("event_id").as("c_id"),
          col("next_vp.us").as("v_us"), col("next_vp.p_us").as("p_us"))).as("m"))
        .select(col("m.c_us"), col("m.v_us"), col("m.p_us"))
        .collect()
        .headOption.map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
          r.getLong(2).toInt))
      assert(got === expect, s"path=$path")
      spark.catalog.dropTempView("graft_bt_fixture")
    }
  }
}
