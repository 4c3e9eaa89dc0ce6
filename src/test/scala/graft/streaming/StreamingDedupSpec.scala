package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dedup: `dropDuplicates` on a stream keeps first-seen keys in
  * state — the streaming counterpart of the exact-dedup operator (Dedup
  * q40). Checked against the batch distinct count.
  */
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
}
