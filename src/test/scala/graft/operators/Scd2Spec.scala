package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SCD2 contract q194's oracle can't express as invariants:
  * per user, the version intervals PARTITION the activity timeline —
  * consecutive versions abut exactly (valid_to = next valid_from, no
  * gaps, no overlaps), versions are dense from 1, exactly one current
  * row per user, and the per-version event counts sum back to the
  * user's raw event count (no event lost or double-assigned to a
  * version).
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q194 intervals partition each user's timeline") {
    val rows = graft.SparkEntry.queries("q194_scd2_history")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions dense from 1
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq,
        s"user $u versions not dense")
      // exactly one current row, and it is the last version
      assert(sorted.count(_._7) === 1 && sorted.last._7,
        s"user $u current-row contract broken")
      // consecutive versions abut: valid_to(k) == valid_from(k+1);
      // non-final valid_to is never the -1 sentinel
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 === b._4, s"user $u gap/overlap at version ${a._2}")
          assert(a._5 != -1L || a._7, s"user $u sentinel on non-current")
        case _ => ()
      }
      // adjacent versions change the tracked attribute (else they'd
      // have merged into one run)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 !== b._3, s"user $u adjacent versions share type")
        case _ => ()
      }
    }
    // per-version event counts sum to the raw per-user event count
    val rawCounts = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser.foreach { case (u, vs) =>
      assert(vs.map(_._6).sum === rawCounts(u),
        s"user $u lost/duplicated events across versions")
    }
    assert(byUser.keySet === rawCounts.keySet)
  }
}
