package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Pins q187's line-dedup semantics against a full independent Scala
  * reimplementation on sf0.001: the same line synthesis (boilerplate
  * header/footer + 8-word chunks), a driver-side frequency count, the
  * same >= 5-docs threshold, and order-preserving reassembly. Also pins
  * the headline behavior: the per-source subscribe/copyright lines are
  * gone from every document.
  */
class LineDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q187 drops exactly the lines shared by >= 5 docs, keeps order") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    def lines(source: String, text: String): Seq[String] = {
      val chunks = text.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
      (s"subscribe to the $source mailing list for updates" +: chunks) :+
        s"copyright 2024 $source all rights reserved"
    }

    // corpus-wide distinct-doc frequency per trimmed line
    val freq = docs
      .flatMap { case (id, src, t) => lines(src, t).map(l => (id, l.trim)) }
      .distinct.groupBy(_._2).map { case (l, xs) => l -> xs.length }

    val expected = docs.map { case (id, src, t) =>
      val ls = lines(src, t).map(_.trim)
      val kept = ls.filter(l => freq(l) < 5)
      (id, ls.size.toLong, kept.size.toLong, kept.mkString("\n"))
    }.sortBy(_._1).toSeq

    val got = graft.SparkEntry.queries("q187_line_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

    assert(got === expected)
    assert(got.forall { case (_, nl, nk, _) => nk < nl })
    assert(got.forall(r =>
      !r._4.contains("subscribe") && !r._4.contains("copyright")))
  }
}
