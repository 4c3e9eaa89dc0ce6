package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

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
  /** `mightContainLong(keyCol)` against `bloom`, fully codegen'd.
    *
    * The sketch can't be spelled in SQL text, so the Column is built
    * DIRECTLY around the expression (via
    * [[org.apache.spark.sql.GraftColumnBridge]]) — no temp-function
    * registry round-trip. The registry route this replaces needed a
    * salted name per call (a shared name rebinds the session-global
    * entry: two frames interleaved before analysis could resolve against
    * the WRONG BloomFilter — silent false-negative row drops, ADVICE
    * r10) and then an eviction ring to stop one pinned sketch per call
    * leaking forever — and the ring itself failed when more than its
    * keep-window of probe Columns were built before their frames
    * analyzed (evicted name → "undefined function", ADVICE r11). Direct
    * construction has none of those states: the expression holds its own
    * sketch from birth, resolves at analysis like any built-in, and is
    * garbage-collected with the frames that reference it.
    *
    * `s` is unused but kept in the signature: every registry-based
    * sibling (VectorFunctions, TextFunctions) takes the session, and
    * call sites shouldn't churn if this implementation changes again. */
  def mightContain(s: SparkSession, bloom: BloomFilter, keyCol: String): Column = {
    val _ = s
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomMightContainLong(
        org.apache.spark.sql.GraftColumnBridge.expression(
          org.apache.spark.sql.functions.col(keyCol)),
        bloom))
  }
}
