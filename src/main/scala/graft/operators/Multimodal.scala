package graft.operators

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): media as opaque
  * `binary` payloads with typed metadata, batch-decoded per partition.
  *
  * The pipeline is the real thing end to end — binary columns, metadata
  * struct, hash-partition-free batch iteration via typed `mapPartitions`
  * (the Scala analog of `mapInPandas` batch UDFs), and a REAL codec:
  * payloads are genuine PNG bytes and the decode step is JDK
  * `javax.imageio.ImageIO` (no external dependency). Because the fixture
  * images are generated from a closed-form integer pixel function, the
  * DuckDB oracle recomputes the decoded features independently — the
  * gate is a full encode→PNG→decode round-trip check, and a codec or
  * color-model regression (channel order, alpha, bit depth) fails the
  * hash.
  *
  * Scale notes: decode is the expensive step at 100 TB — it's map-only,
  * so it scales linearly over input splits (no shuffle anywhere in the
  * pipeline); payloads stream through the iterator without materializing
  * a partition in memory.
  */
object Multimodal extends QueryPack {

  // ImageIO's default stream cache backs every read/write with a TEMP
  // FILE on disk — for the in-memory byte-array codec calls here that
  // is one create+delete of a file PER IMAGE, dwarfing the actual
  // encode/decode work. Disable it process-wide (object init runs once
  // per executor JVM before any codec call): streams stay in memory.
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeature(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, payload_kind: String, pix_checksum: Long)

  /** Deterministic fixture pixel: an integer function of (doc, x, y),
    * mirrored verbatim in the oracle SQL. 8-bit channels survive a PNG
    * round-trip losslessly, so decode must reproduce these exact values. */
  private def pixel(docId: Long, x: Int, y: Int): Int = {
    val v = ((docId * 31 + x * 7 + y * 13) % 256).toInt
    (v << 16) | (((v * 5 + 11) % 256) << 8) | ((v * 3 + 7) % 256)
  }

  /** Encode the fixture image for a doc as real PNG bytes (the ingest
    * side a production pipeline replaces with reading media files). */
  private def pngEncode(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(docId, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL codec call: ImageIO PNG decode. Width/height/pixels all come
    * from the decoded image — nothing is carried around the codec. */
  def decodePng(m: MediaRow): MediaFeature = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.payload))
    val (w, h) = (img.getWidth, img.getHeight)
    var checksum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        checksum = (checksum * 31 + (img.getRGB(x, y) & 0xffffff)) %
          graft.functions.Exact.RollingHashMod
        x += 1
      }
      y += 1
    }
    val kind = if (m.payload.length >= 8 && (m.payload(0) & 0xff) == 0x89 &&
      m.payload(1) == 'P' && m.payload(2) == 'N' && m.payload(3) == 'G')
      "png" else "unknown"
    MediaFeature(m.doc_id, w, h, w * h, kind, checksum)
  }

  /** q60: binary ingestion → real PNG payload → per-partition batch
    * decode (ImageIO) → typed feature frame. Image dimensions derive
    * from doc metadata (1 + n_chars mod 16/8), pixels from the fixture
    * function, so the oracle can verify the decoded output bit-exactly
    * without running a codec itself. */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), (lit(1) + col("n_chars") % 16).cast("int").as("w"),
        (lit(1) + col("n_chars") % 8).cast("int").as("h"))
      .as[(Long, Int, Int)]
      // encode step: typed map, no shuffle — payload bytes are born
      // co-located with their input split
      .map { case (id, w, h) => MediaRow(id, pngEncode(id, w, h)) }
    media.mapPartitions(_.map(decodePng))
      .toDF()
      .orderBy("doc_id")
  }

  /** q61: frame sampling — treat each payload as a media container and
    * cut fixed-size frames (explode), extracting per-frame features. The
    * shape (binary → frame explode → per-frame map) is exactly a video
    * frame-sample pipeline; the per-frame feature extraction is the same
    * checksum scheme as q60's decoded-pixel pass. */
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

  /** q133: image RESIZE through the real codec — decode (ImageIO) →
    * half-scale nearest-neighbor subsample (resized (x,y) := source
    * (2x, 2y), the one resize kernel with a bit-exact contract) →
    * RE-ENCODE to PNG → decode again → features. Every production
    * thumbnailing pipeline is exactly this decode→transform→re-encode
    * sandwich; running the checksum on the second decode means a
    * regression in either codec direction or in the subsample indexing
    * fails the hash. Map-only like q60 — the transform never shuffles. */
  private def q133(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), (lit(1) + col("n_chars") % 16).cast("int").as("w"),
        (lit(1) + col("n_chars") % 8).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) => MediaRow(id, pngEncode(id, w, h)) }
    media.mapPartitions(_.map { m =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload))
      val nw = math.max(1, img.getWidth / 2)
      val nh = math.max(1, img.getHeight / 2)
      val small = new java.awt.image.BufferedImage(
        nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) { small.setRGB(x, y, img.getRGB(2 * x, 2 * y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(small, "png", bos)
      decodePng(MediaRow(m.doc_id, bos.toByteArray))
    }).toDF()
      .orderBy("doc_id")
  }

  case class AudioFeature(doc_id: Long, n_samples: Int, peak: Int,
      zero_crossings: Long, rms: Double)

  /** q134: audio as opaque binary — REAL byte-level codec surface: the
    * fixture waveform (a closed-form int16 function) is serialized as
    * LITTLE-ENDIAN 16-bit PCM, and the decode step parses raw bytes back
    * into samples before extracting features (RMS energy, peak,
    * zero-crossing count — the standard VAD/quality trio). A byte-order
    * or width mistake in either direction garbles every sample and fails
    * the hash; the oracle recomputes features from the closed form
    * without touching bytes. Completes the modality set: image (q60/
    * q133), container frames (q61), audio (q134). Map-only, no shuffle.
    * Energy sums are integer (sum of s²) so rms is fp-exact on both
    * engines after one sqrt+round. */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def sample(doc: Long, i: Int): Int = (((doc * 7 + i * 13) % 4096) - 2048).toInt
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), (lit(256) + col("n_chars") % 256).cast("int").as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        val bb = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) { bb.putShort(sample(id, i).toShort); i += 1 }
        MediaRow(id, bb.array())
      }
    media.mapPartitions(_.map { m =>
      val bb = java.nio.ByteBuffer.wrap(m.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = m.payload.length / 2
      var energy = 0L
      var peak = 0
      var crossings = 0L
      var prev = 0
      var i = 0
      while (i < n) {
        val v = bb.getShort(i * 2).toInt
        energy += v.toLong * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && prev * v < 0) crossings += 1
        prev = v
        i += 1
      }
      AudioFeature(m.doc_id, n, peak, crossings,
        BigDecimal(math.sqrt(energy.toDouble / n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toDF()
      .orderBy("doc_id")
  }

  case class PHashRow(doc_id: Long, phash: Long)

  /** q190: image near-duplicate detection by perceptual hash — the
    * multimodal leg of the dedup stack. Each payload is a REAL PNG
    * decoded through ImageIO, reduced to the classic average-hash
    * (aHash): 16×16 → 8×8 blocks of 2×2, per-block luma sum, one bit
    * per block set iff the block beats the image mean (compared as
    * `64·blockSum > totalSum` — all-integer, so the oracle replays it
    * exactly from the closed-form pixel function without a codec).
    * Near-dups are pairs at Hamming distance ≤ 2, found scalably by
    * LSH banding: the 64-bit hash splits into 4 × 16-bit bands, pairs
    * shuffle-join on (band, value), and ≤ 2 errors can touch at most 2
    * bands — the pigeonhole guarantees ≥ 2 intact bands, so banded
    * recall is EXACT. The oracle recomputes the hash from the
    * closed-form pixel function and blocks with a DIFFERENT lossless
    * split (3 bands of 22/21/21 bits: ≤ 2 errors leave ≥ 1 band
    * intact), so the two sides' candidate generation stays independent
    * while both remain exact and feasible at any scale — its original
    * naive 64·N²/2-row pair join was quadratic by construction and
    * unrunnable on the 10× derived corpus.
    * Fixture: image content keys on doc_id % 37 (groups of exact dups)
    * and every 5th doc swaps three pixel pairs across hash blocks — a
    * total-preserving perturbation that flips at most the two touched
    * bits, i.e. a near-but-not-exact duplicate the banding must still
    * pair with its clean group-mates. Scale:
    * decode+hash is map-only; the only shuffle is the band equi-join,
    * work ∝ Σ bucket² — never N².
    *
    * The GROUP COUNT grows with the corpus (M = 37·max(1, N/6000),
    * identical arithmetic in the oracle; M = 37 at every driver fixture
    * scale, so gated results are untouched): real image corpora grow by
    * adding new near-dup groups at roughly constant group size, and a
    * fixed 37-group fixture would instead grow every group linearly —
    * the hamming ≤ 2 pair OUTPUT itself is Σ group², so the sf0.1→sf1
    * fit would measure the fixture's quadratic output, not the
    * operator (1.51 with fixed groups vs ~linear with constant group
    * size — see SCALING.md). */
  private def q190(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val W = 16
    val nDocs = Tables.cachedCount(s, dir, "documents")
    val groupMod = 37L * math.max(1L, nDocs / 6000L)
    def pixelValue(doc: Long, x: Int, y: Int): Int = {
      val g = doc % groupMod
      def base(xx: Int, yy: Int) = ((g * 31 + xx * 7 + yy * 13) % 256).toInt
      // every 5th doc swaps three pixel pairs between hash blocks 0 and
      // 63 — a total-luma-preserving perturbation, so the mean
      // threshold is untouched and AT MOST those two blocks' bits flip:
      // guaranteed near-duplicates at Hamming ≤ 2 (the fixture realizes
      // all of 0, 1 and 2 across the 37 groups), and 37 ⊥ 5 so every
      // group mixes perturbed and clean members
      if (doc % 5 == 0) (x, y) match {
        case (0, 0)   => base(15, 15)
        case (15, 15) => base(0, 0)
        case (1, 0)   => base(14, 15)
        case (14, 15) => base(1, 0)
        case (0, 1)   => base(15, 14)
        case (15, 14) => base(0, 1)
        case _        => base(x, y)
      } else base(x, y)
    }
    def encode(doc: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        W, W, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < W) {
        var x = 0
        while (x < W) {
          val v = pixelValue(doc, x, y)
          img.setRGB(x, y,
            (v << 16) | (((v * 5 + 11) % 256) << 8) | ((v * 3 + 7) % 256))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def ahash(img: java.awt.image.BufferedImage): Long = {
      val bs = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < W) {
        var x = 0
        while (x < W) {
          val rgb = img.getRGB(x, y)
          val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          bs((y / 2) * 8 + x / 2) += gray
          total += gray
          x += 1
        }
        y += 1
      }
      var h = 0L
      var i = 0
      while (i < 64) {
        if (bs(i) * 64 > total) h |= 1L << i
        i += 1
      }
      h
    }
    val hashes = Tables.documents(s, dir)
      .select(col("doc_id")).as[Long]
      // the doc_id scan is one task (single-row-group parquet), which
      // serialized EVERY png encode+decode into that task (measured
      // 1.35 s of a 1.9 s gate at sf0.1); the codec work is perfectly
      // parallel, so spread the ids across the cluster first — a
      // trivial shuffle of bare longs (r17, guide §2: repartition
      // after an unsplittable input feeding CPU-heavy per-row work)
      .repartition(s.sparkContext.defaultParallelism)
      .map(id => MediaRow(id, encode(id)))
      .mapPartitions(_.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        PHashRow(m.doc_id, ahash(img))
      }).toDF()
    val banded = hashes
      .select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bval",
        expr("shiftright(phash, band * 16)").bitwiseAND(lit(0xffffL)))
    val a = banded.select(col("band"), col("bval"),
      col("doc_id").as("doc_a"), col("phash").as("ha"))
    val b = banded.select(col("band"), col("bval"),
      col("doc_id").as("doc_b"), col("phash").as("hb"))
    a.join(b, Seq("band", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= 2)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  override def queries: Seq[Q] = Seq(
    Q("q190_image_phash_dedup", q190, Some(
      """WITH d AS (SELECT doc_id, doc_id % (37 * greatest(1,
        |    (SELECT count(*) FROM documents) // 6000)) AS g FROM documents),
        |a AS (SELECT doc_id, g, unnest(generate_series(0, 15)) AS x FROM d),
        |b AS (SELECT doc_id, g, x, unnest(generate_series(0, 15)) AS y FROM a),
        |v AS (SELECT doc_id, x, y,
        |    CASE WHEN doc_id % 5 = 0 AND x = 0 AND y = 0
        |      THEN (g * 31 + 300) % 256
        |      WHEN doc_id % 5 = 0 AND x = 15 AND y = 15
        |      THEN (g * 31) % 256
        |      WHEN doc_id % 5 = 0 AND x = 1 AND y = 0
        |      THEN (g * 31 + 293) % 256
        |      WHEN doc_id % 5 = 0 AND x = 14 AND y = 15
        |      THEN (g * 31 + 7) % 256
        |      WHEN doc_id % 5 = 0 AND x = 0 AND y = 1
        |      THEN (g * 31 + 287) % 256
        |      WHEN doc_id % 5 = 0 AND x = 15 AND y = 14
        |      THEN (g * 31 + 13) % 256
        |      ELSE (g * 31 + x * 7 + y * 13) % 256 END AS vv FROM b),
        |c AS (SELECT doc_id, x // 2 AS bx, y // 2 AS by,
        |    vv + (vv * 5 + 11) % 256 + (vv * 3 + 7) % 256 AS gray FROM v),
        |blk AS (SELECT doc_id, by * 8 + bx AS bit_i, sum(gray) AS bs
        |        FROM c GROUP BY doc_id, by * 8 + bx),
        |tot AS (SELECT doc_id, sum(bs) AS ts FROM blk GROUP BY doc_id),
        |pb AS (SELECT blk.doc_id, bit_i,
        |    CASE WHEN blk.bs * 64 > tot.ts THEN 1 ELSE 0 END AS bit
        |  FROM blk JOIN tot ON blk.doc_id = tot.doc_id),
        |h AS (SELECT doc_id,
        |    sum(CASE WHEN bit_i < 22
        |        THEN bit * (1::BIGINT << bit_i) ELSE 0 END) AS s0,
        |    sum(CASE WHEN bit_i >= 22 AND bit_i < 43
        |        THEN bit * (1::BIGINT << (bit_i - 22)) ELSE 0 END) AS s1,
        |    sum(CASE WHEN bit_i >= 43
        |        THEN bit * (1::BIGINT << (bit_i - 43)) ELSE 0 END) AS s2
        |  FROM pb GROUP BY doc_id),
        |cand AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.s0 AS a0,
        |    x.s1 AS a1, x.s2 AS a2, y.s0 AS b0, y.s1 AS b1, y.s2 AS b2
        |  FROM h x JOIN h y ON x.s0 = y.s0 AND x.doc_id < y.doc_id
        |  UNION
        |  SELECT x.doc_id, y.doc_id, x.s0, x.s1, x.s2, y.s0, y.s1, y.s2
        |  FROM h x JOIN h y ON x.s1 = y.s1 AND x.doc_id < y.doc_id
        |  UNION
        |  SELECT x.doc_id, y.doc_id, x.s0, x.s1, x.s2, y.s0, y.s1, y.s2
        |  FROM h x JOIN h y ON x.s2 = y.s2 AND x.doc_id < y.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) +
        |       bit_count(xor(a2, b2)) AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) +
        |      bit_count(xor(a2, b2)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin)),
    Q("q134_audio_features", q134, Some(
      """WITH w AS (
        |  SELECT doc_id, CAST(256 + n_chars % 256 AS INT) AS n,
        |    [CAST((doc_id * 7 + i * 13) % 4096 - 2048 AS BIGINT)
        |     FOR i IN generate_series(0, CAST(256 + n_chars % 256 AS INT) - 1)] AS s
        |  FROM documents)
        |SELECT doc_id, n AS n_samples,
        |  CAST(list_max(list_transform(s, x -> abs(x))) AS INT) AS peak,
        |  CAST(len([i FOR i IN generate_series(1, n - 1)
        |            IF s[i] * s[i + 1] < 0]) AS BIGINT) AS zero_crossings,
        |  round(sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE)
        |        / n), 6) AS rms
        |FROM w ORDER BY doc_id""".stripMargin)),
    Q("q133_image_resize", q133, Some(
      """WITH dims AS (
        |  SELECT doc_id,
        |    greatest(1, CAST(1 + n_chars % 16 AS INT) // 2) AS width,
        |    greatest(1, CAST(1 + n_chars % 8 AS INT) // 2) AS height
        |  FROM documents),
        |pix AS (
        |  SELECT doc_id, width, height,
        |    [CAST((v * 65536 + ((v * 5 + 11) % 256) * 256 + (v * 3 + 7) % 256) AS BIGINT)
        |     FOR v IN [(doc_id * 31 + (2 * (i % width)) * 7 + (2 * (i // width)) * 13) % 256
        |               FOR i IN generate_series(0, width * height - 1)]] AS pxs
        |  FROM dims)
        |SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |  CAST(width * height AS INT) AS n_pixels,
        |  'png' AS payload_kind,
        |  list_reduce(list_prepend(0, pxs),
        |    (a, b) -> (a * 31 + b) % 1000000000000000) AS pix_checksum
        |FROM pix ORDER BY doc_id""".stripMargin)),
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
    // Oracle recomputes the decoded pixels from the closed-form fixture
    // function — the Spark side must push real bytes through a real PNG
    // encode+decode to reproduce them.
    Q("q60_multimodal_decode", q60, Some(
      """WITH dims AS (
        |  SELECT doc_id, CAST(1 + n_chars % 16 AS INT) AS width,
        |    CAST(1 + n_chars % 8 AS INT) AS height
        |  FROM documents),
        |pix AS (
        |  SELECT doc_id, width, height,
        |    [CAST((v * 65536 + ((v * 5 + 11) % 256) * 256 + (v * 3 + 7) % 256) AS BIGINT)
        |     FOR v IN [(doc_id * 31 + (i % width) * 7 + (i // width) * 13) % 256
        |               FOR i IN generate_series(0, width * height - 1)]] AS pxs
        |  FROM dims)
        |SELECT doc_id, width, height,
        |  CAST(width * height AS INT) AS n_pixels,
        |  'png' AS payload_kind,
        |  list_reduce(list_prepend(0, pxs),
        |    (a, b) -> (a * 31 + b) % 1000000000000000) AS pix_checksum
        |FROM pix ORDER BY doc_id""".stripMargin)),
  )
}
