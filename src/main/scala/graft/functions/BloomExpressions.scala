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

  /** `mightContainLong(keyCol)` against `bloom`, fully codegen'd.
    *
    * The sketch can't be spelled in SQL text, so registration closes
    * over it — same registry route as [[VectorFunctions]], but the
    * registered name is salted with the sketch's identity hash: a shared
    * name would rebind the session-global entry on every call, and two
    * frames built concurrently (or interleaved before analysis) in one
    * session could silently resolve against the WRONG BloomFilter —
    * false-negative row drops with no error (ADVICE r10). The salt makes
    * each registration single-writer; registry growth is one tiny entry
    * per sketch built, bounded by the (driver-side, per-query) sketch
    * count.
    */
  def mightContain(s: SparkSession, bloom: BloomFilter, keyCol: String): Column = {
    val name = fnName + "_" + Integer.toHexString(System.identityHashCode(bloom))
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomMightContainLong(exprs.head, bloom), "built-in")
    expr(s"$name($keyCol)")
  }
}
