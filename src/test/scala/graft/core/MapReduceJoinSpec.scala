package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The reduce-side join the reference's model can express but never
  * demonstrates (SURVEY.md §2.3 "Joins"): tag records from two co-mapped
  * datasets, group by key, join inside the holistic reduce. Checked
  * against the DataFrame inner join on the same data.
  */
class MapReduceJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("reduce-side inner join via tagged union ≡ DataFrame join") {
    import spark.implicits._
    val orders = (0L until 200L).map(i => (i, i % 37L, (i * 13 % 1000).toDouble))
    val customers = (0L until 37L).filter(_ % 3 != 0).map(k => (k, s"cust_$k"))

    // tagged union: ("O", orderkey, custkey, price) and ("C", custkey, name)
    val tagged = orders.map(o => ("O", o._2, o._1.toString, o._3.toString)) ++
      customers.map(c => ("C", c._1, c._2, ""))
    val joined = MapReduce.run[(String, Long, String, String), Long,
        (String, String, String), Seq[(Long, String, Double)]](
      spark.createDataset(tagged),
      r => Iterator((r._2, (r._1, r._3, r._4))),
      (custkey, vs) => {
        val rows = vs.toSeq // holistic: need both sides of this key
        val names = rows.collect { case ("C", name, _) => name }
        rows.collect { case ("O", okey, price) =>
          names.map(n => (okey.toLong, n, price.toDouble))
        }.flatten
      })
      .flatMap(identity)
      .collect().toSet

    val expected = {
      val byKey = customers.toMap
      orders.flatMap { case (okey, ckey, price) =>
        byKey.get(ckey).map(name => (okey, name, price))
      }.toSet
    }
    assert(joined === expected)
    assert(joined.nonEmpty)
  }
}
