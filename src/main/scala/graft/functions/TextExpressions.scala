package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the first
  * pass of any web-scale text pipeline (the same corpus byte sequence
  * can arrive composed or decomposed; dedup hashes, tokenizers, and
  * equality joins all silently fracture unless every string is brought
  * to one canonical form first).
  *
  * Spark has no built-in normalizer, so the textbook route is a Scala
  * UDF — which breaks WholeStageCodegen for the whole projection and
  * pays serialization per row (the q107-bloom lesson, VERDICT r9 #2).
  * This is instead a real codegen `UnaryExpression` over `UTF8String`
  * calling `java.text.Normalizer` (ICU-equivalent for NFC) inline, so
  * normalization composes with the rest of the stage in one generated
  * function. The fast path matters too: NFC-normalizing ASCII is a
  * no-op, and `Normalizer.isNormalized` short-circuits without
  * allocating, which is the overwhelmingly common case on real corpora
  * — the generated code checks before it copies.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
      input // already canonical (ASCII fast path): no copy
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("nfcStr")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst GENERATOR for word n-gram shingles — the last
  * expression CLASS in the custom-function ladder (scalar q229, typed
  * Aggregator q38, codegen binary q213's dot — and now a table-valued
  * generator): `graft_shingles(text, n)` emits one `(pos, shingle)` ROW
  * per window position, straight from the tokenizer, with NO
  * intermediate array. The composed alternative —
  * `explode(transform(sequence(...), i -> ...))` or collecting a
  * shingle array and exploding it — materializes an O(tokens)
  * array-of-strings per document before the generator runs; on a
  * 100 TB corpus that is the single largest transient allocation in
  * the dedup pipeline's hot path. A Generator STREAMS: GenerateExec
  * pulls one shingle at a time, so per-row state is the token array
  * alone. Split semantics are byte-identical to the dedup pack and the
  * DuckDB oracles: single-space split KEEPING empty tokens
  * (`split(" ", -1)` = SQL `split`/`string_split`). Null text or
  * n > tokens ⇒ zero rows (matching LATERAL's empty-generator
  * behavior); `pos` is 0-based. */
case class ShingleGenerator(text: Expression, size: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size)

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("shingle", StringType,
        nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingles: text must be STRING, got ${text.dataType.sql}")
    else if (size.dataType != org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingles: n must be INT, got ${size.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = text.eval(input)
    val k0 = size.eval(input)
    if (t == null || k0 == null) Iterator.empty
    else {
      val k = k0.asInstanceOf[Int]
      if (k < 1) throw new IllegalArgumentException(
        s"graft_shingles: n must be >= 1, got $k")
      val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (words.length < k) Iterator.empty
      else (0 to words.length - k).iterator.map { i =>
        org.apache.spark.sql.catalyst.InternalRow(
          i, UTF8String.fromString(words.slice(i, i + k).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), size = newChildren(1))
}

object TextFunctions {
  private val fnName = "graft_nfc"
  private[graft] val shinglesName = "graft_shingles"

  /** Register once per session (absent-only, the VectorFunctions
    * discipline — the builder closes over nothing, so a stale
    * registration can never bind wrong state). */
  private def ensureRegistered(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)))
      reg.createOrReplaceTempFunction(
        fnName, exprs => NfcNormalize(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(shinglesName)))
      reg.createOrReplaceTempFunction(
        shinglesName, exprs => ShingleGenerator(exprs(0), exprs(1)), "built-in")
  }

  /** NFC-normalize a string column (by SQL-visible expression text). */
  def nfc(s: SparkSession, sqlText: String): Column = {
    ensureRegistered(s)
    expr(s"$fnName($sqlText)")
  }

  /** Make `graft_shingles` callable from SQL in this session. */
  def ensureShingles(s: SparkSession): Unit = ensureRegistered(s)
}
