package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q165's MATCH_RECOGNIZE-style deadline funnel against a
  * brute-force per-user reference: earliest click, earliest view within
  * the 7-day deadline after it, earliest purchase within the deadline
  * after that — computed by a straight Scala scan over the collected
  * fixture, independent of the distributed three-stage-aggregation plan.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  private val stepUs = 7L * 86400L * 1000000L

  test("q165 deadline funnel equals the brute-force per-user reference") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)

    val expected = ev.flatMap { case (user, rows) =>
      def firstAfter(tpe: String, lo: Long): Option[Long] = {
        val cand = rows.collect {
          case (_, t, us) if t == tpe && us > lo && us <= lo + stepUs => us
        }
        if (cand.isEmpty) None else Some(cand.min)
      }
      val clicks = rows.collect { case (_, "click", us) => us }
      if (clicks.isEmpty) None
      else {
        val c = clicks.min
        val v = firstAfter("view", c)
        val p = v.flatMap(firstAfter("purchase", _))
        val stage =
          if (p.isDefined) "converted" else if (v.isDefined) "viewed" else "clicked"
        Some(user -> (stage, c, v, p))
      }
    }

    val got = graft.SparkEntry.queries("q165_funnel_deadline")(spark, sf)
      .collect()
      .map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> (r.getString(1), r.getLong(2), opt(3), opt(4))
      }.toMap

    assert(got.nonEmpty)
    assert(got === expected)
    // converters must report the exact click→purchase latency
    val latencies = graft.SparkEntry.queries("q165_funnel_deadline")(spark, sf)
      .filter(col("stage") === "converted")
      .select(col("user_id"), col("convert_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    latencies.foreach { case (u, d) =>
      val (_, c, _, p) = expected(u)
      assert(p.get - c === d, s"latency mismatch for user $u")
    }
  }
}
