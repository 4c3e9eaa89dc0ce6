package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dedup: `dropDuplicates` on a stream keeps first-seen keys in
  * state — the streaming counterpart of the exact-dedup operator (Dedup
  * q40). Checked against the batch distinct count.
  */
/** AQE-aware physical-plan flattener: `collect` treats
  * AdaptiveSparkPlanExec and QueryStageExec as leaves, so a naive
  * traversal misses everything inside a finalized adaptive plan. */
object PlanNodes {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  def all(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    (p +: kids.flatMap(all)) ++ p.subqueries.flatMap(all)
  }
}

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("streaming dropDuplicates on content hash equals batch distinct") {
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .select(sha2(col("text"), 256).as("h"))
      .dropDuplicates("h")
    val name = "graft_dd_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).count()
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .select(sha2(col("text"), 256)).distinct().count()
    assert(streamed === batch)
  }

  /** The r12 scale defect pin: q260's static band index is a BUCKETED
    * table, so the per-micro-batch stream-static join must read it with
    * NO Exchange (and no per-batch broadcast rebuild) on the index side
    * — only the O(batch) stream side shuffles. Runs the gate (which
    * builds graft_q260_band_idx / graft_q260_corpus_sh), then drives a
    * stream with the gate's exact join shape and inspects the REAL
    * micro-batch executed plan. */
  test("q260 band-index joins read bucketed tables with no index-side exchange per micro-batch") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    // builds the bucketed index tables as a side effect
    assert(graft.SparkEntry.queries("q260_stream_dedup_admission")(spark, sf).count() > 0)
    assert(spark.catalog.tableExists("graft_q260_band_idx"))
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val probe = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
      .select((col("doc_id") % 32).cast("int").as("band_idx"),
        col("doc_id").as("band_val"), col("doc_id").as("corpus_id"))
    val joined = probe
      .join(spark.table("graft_q260_band_idx").hint("merge"),
        Seq("band_idx", "band_val"))
      .join(spark.table("graft_q260_corpus_sh").hint("merge"), "corpus_id")
    val name = "graft_bktpin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    val plan =
      try {
        q.processAllAvailable()
        q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan
      } finally q.stop()
    val scans = PlanNodes.all(plan).collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(
        _.table.startsWith("graft_q260_")) => f
    }
    assert(scans.size == 2, s"expected both index-table scans, got:\n$plan")
    assert(scans.forall(_.bucketedScan),
      s"index scans must be bucketed (HashPartitioning, no shuffle):\n$plan")
    // no Exchange may sit between an index-table scan and its join: raw
    // index bytes never move per batch (post-join intermediates joining
    // onward are O(batch) rows and legitimately shuffle)
    def leaksIndex(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("graft_q260_"))
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaksIndex(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaksIndex(q.plan)
      case o => o.children.exists(leaksIndex)
    }
    val movedIndex = PlanNodes.all(plan).collect {
      case e: ShuffleExchangeLike if e.children.exists(leaksIndex) => e
      case e: BroadcastExchangeLike if e.children.exists(leaksIndex) => e
    }
    assert(movedIndex.isEmpty,
      s"index side re-exchanges per micro-batch:\n$plan")
    spark.catalog.dropTempView(name)
  }

  /** q261's growing band index shares the layout, plus two properties
    * its foreachBatch relies on: (a) INSERT OVERWRITE of a bid=N
    * partition is idempotent (foreachBatch is at-least-once — a
    * replayed batch must rewrite, not double-append, its slice), and
    * (b) a partitioned-by-bid bucketed table still plans a merge join
    * with no Exchange on the index side (bucket hashing is uniform
    * across partition dirs). */
  test("q261 index layout: per-bid insert-overwrite is idempotent and the probe join elides the index exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val tbl = "graft_q261pin_idx"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq.empty[(Long, Int, Long, Long)]
      .toDF("doc_id", "band_idx", "band_val", "bid")
      .write.partitionBy("bid").bucketBy(16, "band_idx", "band_val")
      .sortBy("band_idx", "band_val").mode("overwrite").saveAsTable(tbl)
    def slice(bid: Long, ids: Range) = ids.map(i =>
        (i.toLong, (i % 32), (i % 7).toLong, bid))
      .toDF("doc_id", "band_idx", "band_val", "bid")
      .repartition(16, col("band_idx"), col("band_val"))
    // the q261 production path: dynamic partition overwrite is a SESSION
    // conf — insertInto's V1 command ignores writer options for it, and
    // under the default STATIC mode each insert would wipe every
    // earlier bid partition
    val confKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getAll.get(confKey)
    spark.conf.set(confKey, "dynamic")
    try {
      slice(0L, 0 until 40).write.mode("overwrite").insertInto(tbl)
      slice(1L, 40 until 90).write.mode("overwrite").insertInto(tbl)
      assert(spark.table(tbl).count() === 90)
      // at-least-once replay of batch 1: same count, same rows
      slice(1L, 40 until 90).write.mode("overwrite").insertInto(tbl)
      assert(spark.table(tbl).count() === 90)
      assert(spark.table(tbl).filter(col("bid") === 1).count() === 50)
    } finally prev.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    val q = Seq((7L, 3, 4L)).toDF("pid", "band_idx", "band_val")
      .join(spark.table(tbl).hint("merge"), Seq("band_idx", "band_val"))
    q.collect() // finalize AQE before inspecting
    val plan = q.queryExecution.executedPlan
    val idxScan = PlanNodes.all(plan).collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == tbl) => f
    }
    assert(idxScan.nonEmpty && idxScan.forall(_.bucketedScan), s"$plan")
    val idxExchanges = PlanNodes.all(plan).collect {
      case e: ShuffleExchangeLike if PlanNodes.all(e).exists {
        case f: FileSourceScanExec => f.tableIdentifier.exists(_.table == tbl)
        case _ => false
      } => e
    }
    assert(idxExchanges.isEmpty, s"index side shuffled:\n$plan")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
