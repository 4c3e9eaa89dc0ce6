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
}
