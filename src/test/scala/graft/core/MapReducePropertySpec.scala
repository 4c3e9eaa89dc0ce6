package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property pin (SURVEY.md §5.2): for arbitrary data and keyspaces,
  * MapReduce.run ≡ a local Scala flatMap/groupBy/reduce oracle, for a
  * holistic (order-sensitive-unless-sorted) reduce and both partitioning
  * paths. Seeded random cases — deterministic, no scalatestplus bridge
  * needed in the offline environment.
  */
class MapReducePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("run ≡ local oracle (holistic sorted-concat, both paths, 10 cases)") {
    import spark.implicits._
    val rnd = new Random(42)
    for (caseNo <- 1 to 10) {
      val n = 1 + rnd.nextInt(200)
      val m = 1 + rnd.nextInt(12)
      val xs = List.fill(n)(rnd.nextInt(2001) - 1000)
      val mapF = (x: Int) => Iterator((math.floorMod(x, m), x.toLong))
      val localOracle = xs.flatMap(mapF).groupBy(_._1)
        .map { case (k, kvs) => (k, kvs.map(_._2).sorted.mkString(",")) }
        .toSeq.sortBy(_._1)
      for (parts <- Seq(None, Some(3))) {
        val got = MapReduce.run[Int, Int, Long, (Int, String)](
          spark.createDataset(xs), mapF,
          (k, vs) => (k, vs.toSeq.sorted.mkString(",")), parts)
          .collect().toSeq.sortBy(_._1)
        assert(got === localOracle, s"case $caseNo parts=$parts m=$m n=$n")
      }
    }
  }
}
