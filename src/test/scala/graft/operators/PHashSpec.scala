package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Pins q190 two ways on sf0.001: (1) the LSH-banded join returns
  * EXACTLY the naive all-pairs Hamming ≤ 2 set (the pigeonhole
  * exactness claim: ≤ 2 bit errors leave ≥ 2 of 4 bands intact), and
  * (2) the codec path (PNG encode → ImageIO decode → aHash) agrees with
  * this codec-free closed-form reimplementation of the fixture — a
  * channel-order or bit-depth regression breaks the hashes and fails
  * the pair set. Also asserts the fixture realizes nonzero Hamming
  * pairs, so the near-dup (not just exact-dup) path stays exercised.
  */
class PHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def ahash(doc: Long): Long = {
    val g = doc % 37
    def base(xx: Int, yy: Int) = ((g * 31 + xx * 7 + yy * 13) % 256).toInt
    def v(x: Int, y: Int): Int =
      if (doc % 5 == 0) (x, y) match {
        case (0, 0)   => base(15, 15)
        case (15, 15) => base(0, 0)
        case (1, 0)   => base(14, 15)
        case (14, 15) => base(1, 0)
        case (0, 1)   => base(15, 14)
        case (15, 14) => base(0, 1)
        case _        => base(x, y)
      } else base(x, y)
    val bs = new Array[Long](64)
    var total = 0L
    for (y <- 0 until 16; x <- 0 until 16) {
      val vv = v(x, y)
      val gray = vv + (vv * 5 + 11) % 256 + (vv * 3 + 7) % 256
      bs((y / 2) * 8 + x / 2) += gray
      total += gray
    }
    (0 until 64).foldLeft(0L)((h, i) => if (bs(i) * 64 > total) h | (1L << i) else h)
  }

  test("q190 banded join equals naive all-pairs Hamming search") {
    val ids = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val h = ids.map(id => id -> ahash(id)).toMap
    val expected = (for {
      i <- ids; j <- ids if i < j
      d = java.lang.Long.bitCount(h(i) ^ h(j)) if d <= 2
    } yield (i, j, d)).toSeq.sorted
    val got = graft.SparkEntry.queries("q190_image_phash_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(got === expected)
    assert(got.exists(_._3 > 0), "fixture lost its nonzero-Hamming pairs")
  }
}
