package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once contract of the DSv2 TSV STREAMING_WRITE (q295):
  * `writeStream.toTable` on the catalog lands whole epochs, and a
  * REPLAYED epoch — Spark's at-least-once redelivery after a restart
  * that committed the sink but not the offset log — lands nothing
  * twice. Two independent guards are pinned separately:
  *
  *   1. the EPOCH LEDGER: a replayed epoch whose marker exists is a
  *      commit-level no-op (temp files dropped, zero renames);
  *   2. the CRASH WINDOW (renames done, marker missing): deterministic
  *      per-(partition, epoch) final names make the replay REPLACE its
  *      own files instead of adding new ones.
  *
  * Both are driven end-to-end through a real checkpoint restart with
  * the commit log truncated — the exact failure Spark documents for
  * sinks without idempotent commits. */
class TsvStreamingSinkSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def freshCatalog(): (String, String) = {
    val name = "graft_st_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(10)
    val root = java.nio.file.Files.createTempDirectory("graft_stsink").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftTsvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Stream the parquet files under `src` into the named table via the
    * given checkpoint; drain and stop. */
  private def drainOnce(src: String, cp: String, table: String): Unit = {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("grp", "string")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // several epochs per run
      .parquet(src)
      .writeStream
      .option("checkpointLocation", cp)
      .toTable(table)
    try q.processAllAvailable() finally q.stop()
  }

  private def writeWave(src: String, from: Int, until: Int): Unit = {
    import spark.implicits._
    (from until until).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
      .coalesce(1).write.mode("append").parquet(src)
  }

  /** Truncate the checkpoint's commit log by one entry — and drop the
    * ChecksumFs `.N.crc` sibling too, or the replayed commit's rename
    * hits the stale checksum and the restart dies for the wrong reason. */
  private def dropLatestCommit(cp: String): Unit = {
    val commits = new java.io.File(cp, "commits")
    val latest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(latest.delete())
    new java.io.File(commits, s".${latest.getName}.crc").delete()
  }

  test("toTable streams across a restart; grown source, no replay, no loss") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.sink (id BIGINT, grp STRING)")
    val src = tmpDir("q295_src"); val cp = tmpDir("q295_cp")
    writeWave(src, 0, 50)
    drainOnce(src, cp, s"$cat.ns.sink")
    writeWave(src, 50, 100)
    drainOnce(src, cp, s"$cat.ns.sink") // same checkpoint: resume only
    val r = spark.table(s"$cat.ns.sink")
      .agg(count(lit(1)), countDistinct(col("id")), sum(col("id"))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((100L, 100L, 4950L)))
  }

  test("epoch ledger: a replayed epoch (commit log truncated) lands nothing twice") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.sink (id BIGINT, grp STRING)")
    val src = tmpDir("q295r_src"); val cp = tmpDir("q295r_cp")
    writeWave(src, 0, 40)
    drainOnce(src, cp, s"$cat.ns.sink")
    // ledger markers exist for every committed epoch
    val ledgers = new java.io.File(s"$root/ns/sink/_streaming_commits")
    assert(ledgers.isDirectory && ledgers.listFiles().nonEmpty)
    // simulate "sink committed, offset log did not": drop the LAST
    // commit-log entry so the restart replays that epoch's offsets
    dropLatestCommit(cp)
    drainOnce(src, cp, s"$cat.ns.sink") // replays last epoch → ledger no-op
    val r = spark.table(s"$cat.ns.sink")
      .agg(count(lit(1)), countDistinct(col("id"))).head()
    assert((r.getLong(0), r.getLong(1)) === ((40L, 40L)), "replay duplicated rows")
  }

  test("update mode appends a changelog; latest-per-key reconstructs the aggregate") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.chg (grp STRING, n BIGINT)")
    val src = tmpDir("q295u_src"); val cp = tmpDir("q295u_cp")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("grp", "string")
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("grp").agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", cp)
        .toTable(s"$cat.ns.chg")
      try q.processAllAvailable() finally q.stop()
    }
    writeWave(src, 0, 30)  // one file per wave (coalesce(1))
    writeWave(src, 30, 60)
    drain() // 2 epochs; groups counted in both emit an UPDATED row each
    val all = spark.table(s"$cat.ns.chg").collect()
    // changelog semantics: more rows than groups (updated keys re-emitted)
    assert(all.length > 3, s"expected per-epoch deltas, got ${all.length} rows")
    // latest-per-key (max n is latest for a grow-only count) ≡ batch agg
    val latest = spark.table(s"$cat.ns.chg")
      .groupBy("grp").agg(max("n").as("n"))
      .orderBy("grp").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(latest.sameElements(Array("g0" -> 20L, "g1" -> 20L, "g2" -> 20L)),
      latest.mkString(","))
  }

  test("a .gz shard arriving mid-stream reads as one micro-batch split") {
    // the micro-batch source logs newly-seen data files per version and
    // its splits come from the same TsvLayout.byteSplits as batch — so
    // a gzipped shard landing in a live store must stream exactly like
    // a plain one (one split, decompressed in the reader)
    val store = tmpDir("gz_stream_store")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(store, "part-00000.txt"),
      (0 until 20).map(i => s"$i\tg${i % 2}").mkString("\n").getBytes("UTF-8"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("grp", "string")
    val name = "gzstream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream
      .format(classOf[TsvSourceProvider].getName)
      .schema(schema).option("path", store).load()
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try {
      q.processAllAvailable()
      val gz = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$store/part-00001.txt.gz"))
      try gz.write((20 until 40).map(i => s"$i\tg${i % 2}")
        .mkString("\n").getBytes("UTF-8"))
      finally gz.close()
      q.processAllAvailable() // the gz shard is the second batch's delta
      val got = spark.table(name).orderBy("grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.sameElements(Array(("g0", 20L, 380L), ("g1", 20L, 400L))),
        got.mkString(","))
    } finally { q.stop(); spark.catalog.dropTempView(name) }
  }

  test("crash window: marker missing after renames — replay replaces, never duplicates") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.sink (id BIGINT, grp STRING)")
    val src = tmpDir("q295c_src"); val cp = tmpDir("q295c_cp")
    writeWave(src, 0, 40)
    drainOnce(src, cp, s"$cat.ns.sink")
    // simulate a crash between the final rename and the marker write:
    // delete BOTH the last sink marker and the last offset commit
    val ledger = new java.io.File(s"$root/ns/sink/_streaming_commits")
      .listFiles().head
    val lastMarker = ledger.listFiles()
      .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
    assert(lastMarker.delete())
    dropLatestCommit(cp)
    drainOnce(src, cp, s"$cat.ns.sink") // re-lands the epoch onto the SAME names
    val r = spark.table(s"$cat.ns.sink")
      .agg(count(lit(1)), countDistinct(col("id"))).head()
    assert((r.getLong(0), r.getLong(1)) === ((40L, 40L)), "crash-window replay duplicated rows")
  }
}
