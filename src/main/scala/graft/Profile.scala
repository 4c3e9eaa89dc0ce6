package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries (repeats, per-run seconds) and
  * optionally dump the formatted plan. Not part of the driver contract.
  *
  * Usage: runMain graft.Profile <sfDir> <repeats> [--explain] <query ...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = args(1).toInt
    val explain = args.contains("--explain")
    val names = args.drop(2).filterNot(_ == "--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse_profile").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def clearState(): Unit = {
      // same hygiene as Bench: NEVER unpersist process-pinned shared
      // checkpoints (their truncated lineage cannot be recomputed; a
      // blanket unpersist here made any query after a pinned-cache user
      // die with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
      PinnedBlocks.clearUnpinned(spark)
      spark.catalog.clearCache()
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"==== $name plan ====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        clearState()
        dt
      }
      println(f"==== $name: ${times.map(t => f"$t%.2f").mkString(", ")} s")
    }
    spark.stop()
  }
}
