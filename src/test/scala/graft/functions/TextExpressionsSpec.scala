package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the NfcNormalize codegen expression: value parity with
  * java.text.Normalizer on composed/decomposed/mixed/null inputs, and
  * the codegen path actually engaging (no interpreted fallback).
  */
class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_nfc matches java.text.Normalizer across forms, keeps nulls") {
    import spark.implicits._
    val cases = Seq(
      "plain ascii stays",
      "e\u0301 decomposed acute",       // composes to U+00E9
      "\u00e9 already composed",        // NFC no-op
      "a\u030a ring and o\u0308 umlaut", // compose to U+00E5 U+00F6
      "\u212b angstrom sign",           // composes to U+00C5
      "mixed e\u0301e\u0301e\u0301 run",
      "")
    val df = cases.toDF("s")
      .withColumn("n", TextFunctions.nfc(spark, "s"))
    val got = df.select("s", "n").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    for (c <- cases) {
      val want =
        java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC)
      assert(got(c) === want, s"NFC of ${c.codePoints.toArray.toSeq}")
    }
    // null in → null out (nullIntolerant contract)
    val nulls = Seq[Option[String]](None, Some("x")).toDF("s")
      .withColumn("n", TextFunctions.nfc(spark, "s"))
      .collect().map(r => (r.isNullAt(0), r.isNullAt(1)))
    assert(nulls.contains((true, true)) && nulls.contains((false, false)))
  }

  test("graft_nfc runs inside WholeStageCodegen (no UDF, no fallback)") {
    // non-foldable input (depends on id) so the projection can't be
    // constant-folded into a LocalTableScan \u2014 the generated code must
    // actually execute the expression
    val df = spark.range(4)
      .select(concat(lit("e\u0301x"), col("id").cast("string")).as("s"))
      .withColumn("n", TextFunctions.nfc(spark, "s"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1))
    for ((s, n) <- rows) {
      assert(n ===
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      assert(n !== s, "decomposed input must actually change")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "expected a WholeStageCodegen stage")
    val udfs = df.queryExecution.optimizedPlan.flatMap(_.expressions.flatMap(
      _.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      }))
    assert(udfs.isEmpty, s"plan contains ScalaUDF: $udfs")
  }
}
