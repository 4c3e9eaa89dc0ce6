package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst probe for a driver-built [[BloomFilter]] sketch —
  * the runtime semi-join reduction's hot path (q107).
  *
  * A Scala `udf((k: Long) => bloom.mightContain(k))` forces the probe
  * side of the fact scan out of whole-stage codegen (every row pays the
  * ScalaUDF boxing + safe-projection detour). This expression instead
  * ships the sketch as a codegen reference object and emits a direct
  * `mightContainLong` call, so the scan → filter → exchange pipeline
  * stays one codegen'd stage. Mirrors what Spark's own
  * `InjectRuntimeFilter` rule produces for star joins, but usable on a
  * sketch built explicitly with `df.stat.bloomFilter`.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  // name the probe recognizably in plan dumps (ScaleOpsSpec pins on it)
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The sketch rides the plan as a reference object (serialized once
    // with the task binary, shared by every row in the partition) — the
    // same transport the closure-based udf used, minus the per-row
    // ScalaUDF overhead.
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  private val fnName = "graft_bloom_probe"
  private val counter = new java.util.concurrent.atomic.AtomicLong(0)
  // ring of our own recent registrations per session: old entries pin a
  // whole BloomFilter each, so without eviction a long-lived session
  // (repeated bench/verify rounds) would leak one sketch per call
  private val recent = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.ArrayDeque[String]]()
  private val Keep = 8

  /** `mightContainLong(keyCol)` against `bloom`, fully codegen'd.
    *
    * The sketch can't be spelled in SQL text, so registration closes
    * over it — same registry route as [[VectorFunctions]], but the
    * registered name is salted with a MONOTONIC counter: a shared name
    * would rebind the session-global entry on every call, and two frames
    * built concurrently (or interleaved before analysis) in one session
    * could silently resolve against the WRONG BloomFilter —
    * false-negative row drops with no error (ADVICE r10). (A counter,
    * not identityHashCode: identity hashes can collide between two live
    * sketches, which would reintroduce the same race.) Names resolve at
    * ANALYSIS time — once a frame is analyzed the expression holds the
    * sketch directly — so only a bounded window of recent registrations
    * is kept per session; older ones are dropped to stop the registry
    * from pinning one sketch per call forever. */
  def mightContain(s: SparkSession, bloom: BloomFilter, keyCol: String): Column = {
    val name = fnName + "_" + counter.incrementAndGet()
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomMightContainLong(exprs.head, bloom), "built-in")
    val ring = recent.computeIfAbsent(s, _ => new java.util.ArrayDeque[String]())
    ring.synchronized {
      ring.addLast(name)
      while (ring.size > Keep) {
        val stale = ring.removeFirst()
        s.sessionState.functionRegistry.dropFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(stale))
      }
    }
    expr(s"$name($keyCol)")
  }
}
