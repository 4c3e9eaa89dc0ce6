package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extension installs without error and the function builder works") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("graft_dot is callable from SQL once registered") {
    graft.functions.VectorFunctions.dot(spark, "x", "x") // triggers registration
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0)
    assert(r === 11.0)
  }

  test("graft_sql2 matches the HOF squared-L2 fold bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(50)((Seq.fill(8)(rnd.nextGaussian()),
      Seq.fill(8)(rnd.nextGaussian()))).toDF("a", "b")
    graft.functions.VectorFunctions.squaredL2(spark, "a", "b")
    val pairs = df.select(
      expr("graft_sql2(a, b)").as("native"),
      expr("aggregate(sequence(0, 7), 0.0D, " +
        "(acc, i) -> acc + (a[i] - b[i]) * (a[i] - b[i]))").as("hof"))
      .collect()
    // exact double equality: the expression's sequential adds must be
    // bit-identical to the left-to-right HOF fold (the q113 oracle
    // contract rides on this)
    pairs.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_dot codegen and interpreted paths agree") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    graft.functions.VectorFunctions.dot(spark, "a", "b")
    val viaSql = df.selectExpr("graft_dot(a, b)").head.getDouble(0)
    val viaHof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, z) => acc + z)).head.getDouble(0)
    assert(viaSql === viaHof)
    assert(viaSql === 32.0)
  }
}
