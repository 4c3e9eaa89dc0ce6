package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q259, the sign-pattern bucketed scale-duplicate detector:
  *
  *   - RECALL is exactly 1 on its class: every planted positively-scaled
  *     duplicate pair (and nothing else) must surface — the sign-pattern
  *     bucket key is provably preserved by positive scaling, so a miss
  *     means the signature construction broke.
  *   - The PLAN is a plain equi-join on the signature — no
  *     CartesianProduct, no tile fan-out (the point of the bucketed tier
  *     is that candidate volume is Σ|bucket|², never N²).
  */
class SignBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q259 finds exactly the planted scale-dups (recall 1, precision 1)") {
    val base = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val expected = base.filter(_ % 10 == 0).map(id => (id, id + 1000000L)).toSet
    val got = graft.SparkEntry.queries("q259_scale_dup_signs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("q259 plan is a signature equi-join: no cartesian, no tile fan-out") {
    val df = graft.SparkEntry.queries("q259_scale_dup_signs")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the tiled oracle path (q45) fans each row into B tiles via
    // explode; the bucketed tier must NOT
    assert(!plan.toLowerCase.contains("generate"), plan)
    assert(plan.contains("sig"), "join must key on the sign signature")
  }
}
