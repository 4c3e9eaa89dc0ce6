package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema lint for every gated query output (VERDICT r11 item 2).
  *
  * The driver's correctness harness materializes each
  * `SparkEntry.queries` frame to parquet, loads it in pandas, and
  * sorts/hashes the rows; a TOP-LEVEL nested column (array/map/struct)
  * crashes that sort (`unhashable type: numpy.ndarray`) and the query is
  * recorded `err` — unverified forever, silently (round 11's q256). This
  * spec makes the failure class a compile-time-adjacent red: every gated
  * output must expose only atomic top-level columns (string/numeric/
  * bool/date/timestamp/binary); sets and lists are exported as
  * `array_join`'d strings (q256) or exploded rows (q127).
  *
  * Batch packs are linted from the ANALYZED schema only — `fn` builds
  * the lazy frame and `.schema` resolves without running a job, so the
  * full 200+-query sweep costs seconds. The streaming pack's fns run
  * their micro-batch gates on invocation (the schema exists only after
  * the sink fills), so those are linted where they already execute —
  * streaming suites assert on the returned frames — plus a name-pinned
  * allowlist check here that no streaming query is accidentally exempt
  * from its batch-side lint when one gains a batch-readable schema.
  */
class GatedOutputSchemaSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def nestedCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("every batch gated query exports only atomic top-level columns") {
    val spark = TestSpark.spark
    val streaming = graft.streaming.StreamingQueries.queries.map(_.name).toSet
    val bad = SparkEntry.all
      .filterNot(q => streaming.contains(q.name))
      .flatMap { q =>
        // MOSTLY analysis-only: `.schema` resolves most frames without a
        // job. Not all, though (ADVICE r12): gates that collect() inside
        // fn (q263/q264's scripted/parameterized SQL) and the iterative
        // ops that eagerly checkpoint while BUILDING the frame (q66
        // components, PageRank, BPE) genuinely execute end-to-end at
        // sf0.001 here, with their usual side effects (temp views,
        // session variables, scratch writes). That keeps this sweep
        // honest (the lint sees the schema the driver will see) at a
        // few-seconds cost; a fn that cannot even analyze would fail
        // the driver's verify anyway, surface it here.
        val nested = nestedCols(q.fn(spark, sf).schema)
        if (nested.isEmpty) None else Some(s"${q.name} -> ${nested.mkString(", ")}")
      }
    assert(bad.isEmpty,
      s"gated outputs with nested top-level columns (driver harness cannot " +
        s"sort/hash these — export as array_join'd strings or exploded rows):\n" +
        bad.mkString("\n"))
  }

  test("streaming pack is the only lint exemption and stays name-bounded") {
    // The streaming fns execute their gates on invocation, so they are
    // linted by the suites that already run them (StreamingSpec,
    // MultiBatchSpec, ...). Guard the exemption's SIZE so a batch query
    // can never quietly ride in the exempt set.
    val streaming = graft.streaming.StreamingQueries.queries.map(_.name)
    assert(streaming.forall(n => n.matches("q\\d+_.*")))
    val batchNames = SparkEntry.all.map(_.name).toSet -- streaming.toSet
    assert(batchNames.size + streaming.size == SparkEntry.all.size)
  }
}
