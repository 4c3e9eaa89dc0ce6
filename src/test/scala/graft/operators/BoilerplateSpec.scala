package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q182's boilerplate-extraction rules line by line: the content
  * paragraph survives with its inline anchor TEXT, while each chrome
  * line is killed by a specific rule (nav/heading by the length rule,
  * footer by tag density, the read-more row by link density).
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def collapse(s: String): String =
    s.replaceAll(" +", " ").trim

  test("q182 keeps exactly the content line, anchor text inlined") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.SparkEntry.queries("q182_boilerplate_extract")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty && got.length === docs.size)
    got.foreach { case (id, nKept, main) =>
      // the one surviving line is the <p> paragraph, tag-stripped, with
      // the inline reference-docs anchor reduced to its text
      assert(nKept === 1L, s"doc $id kept $nKept lines")
      assert(main === collapse(docs(id) + " See reference docs for details."),
        s"doc $id main text mismatch")
      // every boilerplate fragment is gone — nav (length rule), heading
      // (length rule), read-more row (link density), footer (tag
      // density), script/style bodies (element strip)
      for (frag <- Seq("Home Docs About", "continue reading",
          "Copyright 2024", "Terms Privacy Contact", "location.href",
          "margin: 0"))
        assert(!main.contains(frag), s"doc $id leaked boilerplate: $frag")
    }
  }
}
