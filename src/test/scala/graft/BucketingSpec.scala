package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join strategy for repeated fact-fact joins at
  * scale — both sides pre-hashed into the same bucket count on the join
  * key, so the join runs with NO shuffle exchange on either side. This is
  * the 100 TB answer to "orders⋈customer runs nightly"; verified here by
  * plan inspection and value equality against the unbucketed join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s
  }
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("graft_orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("graft_customer_b")
    try {
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce hash-partitioning exchanges:
      // bucketed scans already satisfy the join's distribution requirement
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"unexpected shuffle before bucketed join:\n$plan")

      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted
      assert(joined.collect().map(_.toString).sorted === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    }
  }
}
