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

  test("a doc that loses ALL lines still reports its true n_lines") {
    // The shipped fixtures contain no doc whose every line is boilerplate,
    // so the ADVICE-r9 edge (aggregate has no row for the doc; a
    // coalesce-to-0 would lie about n_lines) was latent — synthesize it:
    // six identical docs of one source make EVERY line (header, all
    // chunks, footer) shared by >= 5 docs, while two unique-source docs
    // keep theirs. Both the Scala gate and the DuckDB oracle now carry
    // n_lines from the pre-dedup base frame; this pins the Scala side.
    import spark.implicits._
    val clones = (0L until 6L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "en", "dup-src", 60L))
    val uniques = Seq(
      (10L, "one two three four five six seven eight nine ten", "en", "u1", 50L),
      (11L, "red orange yellow green blue indigo violet pink black white",
        "en", "u2", 60L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_linededup_edge").toString
    (clones ++ uniques).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val got = graft.SparkEntry.queries("q187_line_dedup")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      // 10 words -> 2 chunks -> 4 lines per doc (header + 2 + footer)
      val cloneRows = got.filter(_._1 < 6L)
      assert(cloneRows.size === 6)
      assert(cloneRows.forall { case (_, nl, nk, ct) =>
        nl == 4L && nk == 0L && ct == "" })
      // the unique docs keep every line
      assert(got.filter(_._1 >= 10L).forall {
        case (_, nl, nk, _) => nl == 4L && nk == 4L })
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
