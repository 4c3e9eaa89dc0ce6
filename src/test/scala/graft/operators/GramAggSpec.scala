package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q273's one-pass Gram aggregator: the buffer fold must be exactly the
  * explode-and-sum formulation it replaces, independent of how rows are
  * split across partitions (reduce/merge associativity — the property
  * map-side combine relies on at any cluster size). */
class GramAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def byAggregator(nParts: Int) = {
    import graft.sources.Tables
    val gram = udaf(Similarity.GramAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    Tables.embeddings(spark, sf).repartition(nParts)
      .agg(gram(col("embedding")).as("g"))
      .select(explode(col("g")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.s").as("gram"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
  }

  test("q273 equals the brute-force explode formulation") {
    import graft.sources.Tables
    // the shuffle-heavy shape the Aggregator replaces: explode every
    // vector to its (i, j, n_i*n_j) terms and group by (i, j)
    val scaled = Tables.embeddings(spark, sf).select(
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1000000.0)).cast("long")).as("v"))
    val vecs = scaled.collect().map(_.getSeq[Long](0).toArray)
    val d = vecs.head.length
    val expect = for {
      i <- 0 until d; j <- i until d
    } yield (i + 1, j + 1, vecs.map(v => v(i) * v(j)).sum)
    assert(byAggregator(4) === expect.sorted)
  }

  test("q273 result is invariant to the partition split (merge associativity)") {
    assert(byAggregator(1) === byAggregator(13))
  }
}
