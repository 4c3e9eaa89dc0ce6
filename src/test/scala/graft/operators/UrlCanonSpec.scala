package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule pins for q185's URL canonicalizer on hand-built edge
  * cases the fixture variants don't cover: http default port, non-
  * default port preserved, root path, fragment-only, all-tracking
  * query, already-canonical passthrough.
  */
class UrlCanonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(DataPrep.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalizer rules on edge-case URLs") {
    val cases = Seq(
      // already canonical → unchanged
      "https://example.com/a?x=1" -> "https://example.com/a?x=1",
      // case, www, default port, trailing slash, fragment
      "HTTP://WWW.Example.ORG:80/A/B/#sec" -> "http://example.org/A/B",
      // NON-default port survives
      "https://example.com:8443/a" -> "https://example.com:8443/a",
      // http keeps :443 (not its default)
      "http://example.com:443/a" -> "http://example.com:443/a",
      // root path collapses to bare host
      "https://example.com/" -> "https://example.com",
      // all params are tracking → no query at all
      "https://example.com/a?utm_source=x&ref=y&fbclid=z" ->
        "https://example.com/a",
      // params sort; tracking dropped from the middle
      "https://example.com/a?b=2&utm_medium=m&a=1" ->
        "https://example.com/a?a=1&b=2",
      // a param NAMED like a value of ref= but not matching stays
      "https://example.com/a?reference=1" ->
        "https://example.com/a?reference=1")
    assert(canon(cases.map(_._1): _*) === cases.map(_._2))
  }

  test("canonicalizer is idempotent on generated messy URLs") {
    // A canonicalizer that isn't a fixpoint silently splits dedup
    // groups when a pipeline canonicalizes twice (ingest + re-crawl).
    // Generate the mess space the rules cover — scheme/host casing,
    // www, default and non-default ports, trailing slashes, shuffled
    // tracking/real params, fragments — and pin canon∘canon = canon.
    import org.scalacheck.Gen
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS", "HtTpS")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Example.COM", "sub.Example.org", "x-y.net")
      port <- Gen.oneOf("", ":80", ":443", ":8443")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/A/b///")
      params <- Gen.someOf(Seq("a=1", "B=2", "utm_source=x",
        "utm_campaign=Y", "ref=rss", "fbclid=z", "gclid=g", "z="))
      frag <- Gen.oneOf("", "#frag", "#a/b?c=1")
    } yield {
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      s"$scheme://$www$host$port$path$q$frag"
    }
    val urls = Gen.listOfN(300, urlGen).sample.getOrElse(Nil)
    assert(urls.nonEmpty)
    import spark.implicits._
    val rows = urls.toDF("url")
      .select(DataPrep.canonicalizeUrl(col("url")).as("c1"))
      .select(col("c1"),
        DataPrep.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"not a fixpoint: ${r.getString(0)} -> ${r.getString(1)}")
    }
  }
}
