package graft.operators

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): media as opaque
  * `binary` payloads with typed metadata, batch-decoded per partition.
  *
  * The Spark-side architecture is the real thing — binary columns,
  * metadata struct, hash-partitioned batch iteration via typed
  * `mapPartitions` (the Scala analog of `mapInPandas` batch UDFs), and a
  * deterministic feature schema out. Only the codec call itself is
  * STUBBED (this container ships no image/audio libraries): the "decode"
  * is a deterministic byte-level fake, cleanly isolated in
  * [[Multimodal.decodeStub]] where a JNI/javacpp codec would slot in.
  *
  * Scale notes: decode is the expensive step at 100 TB — it's map-only,
  * so it scales linearly over input splits (no shuffle anywhere in the
  * pipeline); payloads stream through the iterator without materializing
  * a partition in memory.
  */
object Multimodal extends QueryPack {

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeature(doc_id: Long, payload_len: Int, first_byte: Int,
      width: Int, height: Int, checksum: Long)

  /** STUB — stands in for a real image/audio decoder (not available in
    * this environment). Deterministic over bytes so results are
    * verifiable end-to-end. */
  def decodeStub(m: MediaRow): MediaFeature = {
    var checksum = 0L
    var i = 0
    while (i < m.payload.length) {
      checksum = (checksum * 31 + (m.payload(i) & 0xff)) %
        graft.functions.Exact.RollingHashMod
      i += 1
    }
    MediaFeature(m.doc_id, m.payload.length,
      if (m.payload.nonEmpty) m.payload(0) & 0xff else -1,
      m.width, m.height, checksum)
  }

  /** q60: binary ingestion → metadata struct → per-partition batch decode
    * → typed feature frame. Payload here is the utf-8 text bytes (the
    * container has no real media), so byte-level features are
    * SQL-checkable for the ASCII fixtures (the oracle checksums
    * codepoints, which equal bytes only for ASCII — a non-ASCII corpus
    * would need a byte-level oracle). */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      // no repartition: decode is map-only, and input splits already
      // spread payload bytes evenly — a hash repartition here would
      // shuffle the entire byte volume for zero semantic benefit (at
      // 100 TB that shuffle would dominate the query).
      .as[MediaRow]
    media.mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }

  /** q61: frame sampling — treat each payload as a media container and
    * cut fixed-size frames (explode), extracting per-frame features. The
    * shape (binary → frame explode → per-frame map) is exactly a video
    * frame-sample pipeline; the codec call is the same stub boundary as
    * q60. */
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 64
    Tables.documents(s, dir)
      // empty docs produce no frames; without this filter Spark's
      // sequence(0, floor(-1/64)) yields a DESCENDING [0, -1] while the
      // oracle's generate_series(0, -1) is empty
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          floor((length(col("text")) - 1) / frameLen).cast("long"))).as("frame_id"))
      .select(col("doc_id"), col("frame_id"),
        expr(s"substring(text, CAST(1 + $frameLen * frame_id AS INT), $frameLen)").as("frame_txt"))
      .select(col("doc_id"), col("frame_id"),
        length(col("frame_txt")).as("frame_len"),
        graft.functions.Exact.rollingHash(
          transform(regexp_extract_all(col("frame_txt"), lit("."), lit(0)),
            c => ascii(c).cast("long"))).as("frame_checksum"))
      .orderBy("doc_id", "frame_id")
  }

  override def queries: Seq[Q] = Seq(
    Q("q61_frame_sample", q61, Some(
      """WITH f AS (
        |  SELECT doc_id, [{'fid': i, 'txt': substring(text, CAST(1 + 64*i AS INT), 64)}
        |    FOR i IN generate_series(0, CAST(floor((length(text)-1)/64) AS BIGINT))] AS frames
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, u.fid AS frame_id, length(u.txt) AS frame_len,
        |  list_reduce(list_prepend(0, list_transform(regexp_extract_all(u.txt, '.'),
        |    c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000000000000) AS frame_checksum
        |FROM (SELECT doc_id, unnest(frames) AS u FROM f)
        |ORDER BY doc_id, frame_id""".stripMargin)),
    Q("q60_multimodal_decode", q60, Some(
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_len,
        |  CASE WHEN length(text) = 0 THEN -1
        |       ELSE ascii(substring(text, 1, 1)) END AS first_byte,
        |  CAST(n_chars % 640 AS INT) AS width,
        |  CAST(n_chars % 480 AS INT) AS height,
        |  list_reduce(
        |    list_prepend(0, list_transform(regexp_extract_all(text, '.'),
        |      c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000000000000) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin)),
  )
}
