package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native Catalyst AS-OF JOIN — the whole-operator rung (preference (c))
  * of the custom-operator ladder: a [[LogicalPlan]] node, a planner
  * [[SparkStrategy]], and a physical [[AsOfJoinExec]] that declares its
  * distribution/ordering REQUIREMENTS to Catalyst instead of encoding
  * them as query shape.
  *
  * Semantics (identical to the compositional
  * [[graft.operators.AsOfJoin.leftAsOf]], q35's union-window shape): for
  * every left row, attach the payload of the LATEST right row with the
  * same key and `rightTime <= leftTime`, nulls when none. Rows with a
  * null key or null time never match (SQL comparison semantics). Right
  * should be unique per (key, time) — among equal-time right rows the
  * sort-tiebreak winner is carried, so pre-reduce ties upstream for
  * determinism, exactly as the compositional contract states.
  *
  * Why a native operator when (a) already works — what the physical
  * node buys over the union-window shape, all pinned in
  * AsOfJoinNativeSpec:
  *
  *   - **No row widening.** The union shape pads BOTH sides to the
  *     unioned schema (left columns nulled onto right rows and vice
  *     versa) and shuffles the padded union; the native exec shuffles
  *     each side at its own width, exactly like a join.
  *   - **No window buffering.** `last(_, ignoreNulls).over(...)` runs a
  *     WindowExec whose frame machinery buffers rows per partition; the
  *     merge here is a single forward pass holding ONE candidate right
  *     row — O(1) state per key group, never a spillable row buffer.
  *   - **Partitioning survives.** The exec reports the left child's
  *     hash partitioning as its own output partitioning, so a downstream
  *     aggregate on the join key plans WITHOUT another exchange. The
  *     union shape keys its window on an internal `_k` column that is
  *     dropped afterwards, so the partitioning info dies with it and the
  *     downstream aggregate re-shuffles — at 100 TB that is an entire
  *     extra pass over the fact table.
  *
  * Scale shape: one hash exchange + sort per side (EnsureRequirements
  * satisfies the declared [[ClusteredDistribution]]/[[SortOrder]]
  * requirements; AQE coalesces/splits the exchanges as usual), then an
  * O(left + right) streaming merge per partition with O(1) held state.
  * Skew on the as-of key behaves exactly like join skew (same exchange),
  * and the merge never materializes a key group.
  *
  * The reference has no temporal joins at all (its only notion of time
  * is a string prefix — ray_mapreduce/examples, SURVEY.md §1.1); this
  * operator exists for the events workload the blueprint adds.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]; injected per session via
  * [[NativeAsOfJoin.install]] (runtime) or [[graft.GraftExtensions]]
  * (builder time). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.forward, n.tolerance, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requires both children hash-clustered on their
  * key and sorted by (key, time); executes a per-partition streaming merge
  * that holds at most one candidate right row (backward) or none at all
  * (forward — the lookahead row IS the candidate). Non-codegen (iterator
  * based, like full-outer SMJ); the children's sorts and exchanges are
  * ordinary codegen'd operators inserted by EnsureRequirements.
  *
  * `forward=false`: latest right with `rt <= lt`; `forward=true`:
  * earliest right with `rt >= lt`. `tolerance` (in the time column's
  * own units, physically-long times only) additionally bounds
  * `|rt - lt|`; both direction/bound checks are O(1) at emit, the merge
  * stays one pass.
  */
case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Left rows pass through in input order on left's partitions — both
    * properties survive for downstream planning (the point of the node). */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Physically-long types (stored as a primitive long in InternalRow):
    * the common as-of shapes — bigint keys, epoch-micros / timestamp
    * times — take a boxing-free merge path. */
  private def physLong(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  // ---- whole-stage codegen (the r13 A/B's named cost: the interpreted
  // merge paid ~0.3 µs/row over the codegen'd window it replaces —
  // per-row lambda dispatch, JoinedRow indirection, and an
  // UnsafeProjection materialization per output row). The PRODUCE
  // implementation streams the LEFT side through generated code (the
  // BroadcastHashJoin pattern: one output per probe row), keeps the
  // right-side merge in the compiled [[AsOfMerger]] (monomorphic,
  // JIT-inlined — state machines gain nothing from Janino), and hands
  // the joined columns to the consumer AS VARIABLES, so a downstream
  // aggregate/projection fuses into the same generated loop with no
  // intermediate row at all. Codegen covers the physically-long
  // (bigint/timestamp) key+time shapes — the same set as the
  // interpreted fast path; generic types stay on doExecute. ----

  override def supportCodegen: Boolean =
    physLong(leftKey.dataType) && physLong(leftTime.dataType)

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // one output row per left row, but the forward path hands the
  // consumer columns read from the right iterator's LIVE row — a
  // downstream buffering consumer must copy before the next advance()
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/time must be output attributes of their child")
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val mergerCls = classOf[AsOfMerger].getName
    val merger = ctx.addMutableState(mergerCls, "asofMerger",
      v => s"$v = new $mergerCls(inputs[1], $rkOrd, $rtOrd, $forward, " +
        s"${tolerance.isDefined}, ${tolerance.getOrElse(Long.MaxValue)}L);")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val leftRow = ctx.freshName("asofLeftRow")
    val matched = ctx.freshName("asofMatched")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // right columns read from the matched row, null-extended when no
    // match — generated inline so the null check is a plain branch
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRNull")
      val value = ctx.freshName("asofRVal")
      val jt = CodeGenerator.javaType(a.dataType)
      val cd =
        code"""
              |boolean $isNull = true;
              |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
              |if ($matched != null && !$matched.isNullAt($i)) {
              |  $isNull = false;
              |  $value = ${CodeGenerator.getValue(matched, a.dataType, i.toString)};
              |}
         """.stripMargin
      ExprCode(cd, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  InternalRow $matched = null;
       |  if (!$leftRow.isNullAt($lkOrd) && !$leftRow.isNullAt($ltOrd)) {
       |    $matched = $merger.advance(
       |      $leftRow.getLong($lkOrd), $leftRow.getLong($ltOrd));
       |  }
       |  $numOutput.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val numOutputRows = longMetric("numOutputRows")
    val lkOrd = lOut.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = rOut.indexWhere(_.exprId == rightTime.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/time must be output attributes of their child")
    // re-validate the leftAsOf contract: AsOfJoinNode is a public case
    // class, so a caller constructing it directly could pair a
    // tolerance with a non-physically-long time type — fail with the
    // API's message here rather than a ClassCastException mid-merge
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be non-negative, got $t")
      require(physLong(leftTime.dataType) && physLong(rightTime.dataType),
        s"tolerance needs a physically-long time column, got ${leftTime.dataType}")
    }
    val fastPath = physLong(leftKey.dataType) && physLong(leftTime.dataType)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(allOut, lOut ++ rOut)

      // tolerance as a plain long; `bounded` gates the check entirely
      // when unset. Qualifying diffs are mathematically >= 0 (the merge
      // only tests candidates on the right side of the inequality), so
      // a NEGATIVE computed diff can only mean Long overflow — i.e. the
      // true diff exceeds Long.MaxValue >= tol — and must REJECT, not
      // falsely match (extreme-time hardening; epoch-micros never hits it)
      val bounded = tolerance.isDefined
      val tol = tolerance.getOrElse(Long.MaxValue)

      if (fastPath && forward) {
        // forward merge needs NO held state: rows before lt can never
        // match a later left row (left times ascend), and the first
        // same-key row at rt >= lt — the lookahead itself — is the
        // unique earliest candidate, left unconsumed for the next left
        var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        def advance(): Unit = rHead = if (rIter.hasNext) rIter.next() else null
        lIter.map { l =>
          val out =
            if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) joined(l, nullRight)
            else {
              val lk = l.getLong(lkOrd)
              val lt = l.getLong(ltOrd)
              while (rHead != null &&
                  (rHead.isNullAt(rkOrd) || rHead.getLong(rkOrd) < lk)) advance()
              while (rHead != null && rHead.getLong(rkOrd) == lk &&
                  (rHead.isNullAt(rtOrd) || rHead.getLong(rtOrd) < lt)) advance()
              if (rHead != null && rHead.getLong(rkOrd) == lk && {
                    val d = rHead.getLong(rtOrd) - lt
                    !bounded || (d >= 0 && d <= tol) })
                joined(l, rHead)
              else joined(l, nullRight)
            }
          numOutputRows += 1
          proj(out)
        }
      } else if (fastPath) {
        // backward primitive merge: getLong + Long compares, zero boxing
        var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        var held: InternalRow = null      // copied — shuffle readers reuse buffers
        var heldKey: Long = 0L
        var heldTime: Long = 0L
        var hasHeld = false
        def advance(): Unit = rHead = if (rIter.hasNext) rIter.next() else null
        lIter.map { l =>
          val out =
            if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) joined(l, nullRight)
            else {
              val lk = l.getLong(lkOrd)
              val lt = l.getLong(ltOrd)
              var scanning = true
              while (scanning && rHead != null &&
                  (rHead.isNullAt(rkOrd) || rHead.getLong(rkOrd) < lk)) advance()
              while (scanning && rHead != null && rHead.getLong(rkOrd) == lk) {
                if (rHead.isNullAt(rtOrd)) advance() // nulls sort first, never match
                else if (rHead.getLong(rtOrd) <= lt) {
                  held = rHead.copy(); heldKey = lk
                  heldTime = held.getLong(rtOrd); hasHeld = true
                  advance()
                } else scanning = false
              }
              if (hasHeld && heldKey == lk && {
                    val d = lt - heldTime
                    !bounded || (d >= 0 && d <= tol) }) joined(l, held)
              else joined(l, nullRight)
            }
          numOutputRows += 1
          proj(out)
        }
      } else if (forward) {
        // generic forward merge; tolerance (when set) is guaranteed by
        // the API to come with a physically-long time, so the bound
        // check unboxes the already-fetched values
        val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
        val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        val unbounded = tolerance.isEmpty
        var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        def advance(): Unit = rHead = if (rIter.hasNext) rIter.next() else null
        lIter.map { l =>
          val lk = l.get(lkOrd, keyType)
          val lt = l.get(ltOrd, timeType)
          val out =
            if (lk == null || lt == null) joined(l, nullRight)
            else {
              var scanning = true
              while (scanning && rHead != null) {
                val rk = rHead.get(rkOrd, keyType)
                if (rk == null || keyOrd.compare(rk, lk) < 0) advance()
                else if (keyOrd.compare(rk, lk) == 0) {
                  val rt = rHead.get(rtOrd, timeType)
                  if (rt == null || timeOrd.compare(rt, lt) < 0) advance()
                  else scanning = false
                } else scanning = false
              }
              if (rHead != null && {
                  val rk = rHead.get(rkOrd, keyType)
                  rk != null && keyOrd.compare(rk, lk) == 0 } &&
                  (unbounded || {
                    val d =
                      rHead.get(rtOrd, timeType).asInstanceOf[java.lang.Long] -
                        lt.asInstanceOf[java.lang.Long]
                    d >= 0 && d <= tol }))
                joined(l, rHead)
              else joined(l, nullRight)
            }
          numOutputRows += 1
          proj(out)
        }
      } else {
        // generic backward merge: interpreted ordering over boxed values;
        // tolerance (when set) comes with a physically-long time (API
        // contract), so the bound check unboxes
        val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
        val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        val unbounded = tolerance.isEmpty
        var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        var held: InternalRow = null
        var heldKey: Any = null  // derived from the COPIED row, never the buffer
        var heldTime: Any = null
        def advance(): Unit = rHead = if (rIter.hasNext) rIter.next() else null
        lIter.map { l =>
          val lk = l.get(lkOrd, keyType)
          val lt = l.get(ltOrd, timeType)
          val out =
            if (lk == null || lt == null) joined(l, nullRight)
            else {
              var scanning = true
              while (scanning && rHead != null) {
                val rk = rHead.get(rkOrd, keyType)
                if (rk == null || keyOrd.compare(rk, lk) < 0) advance()
                else if (keyOrd.compare(rk, lk) == 0) {
                  val rt = rHead.get(rtOrd, timeType)
                  if (rt == null) advance() // nulls sort first, never match
                  else if (timeOrd.compare(rt, lt) <= 0) {
                    held = rHead.copy()
                    heldKey = held.get(rkOrd, keyType)
                    heldTime = held.get(rtOrd, timeType)
                    advance()
                  } else scanning = false
                } else scanning = false
              }
              if (held != null && heldKey != null &&
                  keyOrd.compare(heldKey, lk) == 0 &&
                  (unbounded || {
                    val d = lt.asInstanceOf[java.lang.Long] -
                      heldTime.asInstanceOf[java.lang.Long]
                    d >= 0 && d <= tol }))
                joined(l, held)
              else joined(l, nullRight)
            }
          numOutputRows += 1
          proj(out)
        }
      }
    }
  }
}

/** The per-partition right-side state machine behind [[AsOfJoinExec]]'s
  * generated loop — the SAME merge as the interpreted fast paths
  * (doExecute), factored so whole-stage codegen can call it per left
  * row: O(1) held state, one forward pass, overflow-safe tolerance.
  * Caller contract (guaranteed by the exec's required orderings): left
  * probes arrive in ascending (key, time); lk/lt are non-null. The
  * returned row is valid only until the next `advance` call — forward
  * matches are the iterator's live row (the generated consumer reads
  * its columns immediately; buffering consumers copy via
  * `needCopyResult`). */
final class AsOfMerger(rIterRaw: Object, rkOrd: Int, rtOrd: Int,
    forward: Boolean, bounded: Boolean, tol: Long) {
  private[this] val rIter =
    rIterRaw.asInstanceOf[Iterator[InternalRow]]
  private[this] var rHead: InternalRow =
    if (rIter.hasNext) rIter.next() else null
  private[this] var held: InternalRow = null // copied — buffers get reused
  private[this] var heldKey = 0L
  private[this] var heldTime = 0L
  private[this] var hasHeld = false
  private def adv(): Unit =
    rHead = if (rIter.hasNext) rIter.next() else null
  private def inBand(d: Long): Boolean = !bounded || (d >= 0 && d <= tol)

  /** Latest same-key right row with rt <= lt (backward) / earliest with
    * rt >= lt (forward) within tolerance, or null. */
  def advance(lk: Long, lt: Long): InternalRow =
    if (forward) {
      while (rHead != null &&
        (rHead.isNullAt(rkOrd) || rHead.getLong(rkOrd) < lk)) adv()
      while (rHead != null && rHead.getLong(rkOrd) == lk &&
        (rHead.isNullAt(rtOrd) || rHead.getLong(rtOrd) < lt)) adv()
      if (rHead != null && rHead.getLong(rkOrd) == lk &&
        inBand(rHead.getLong(rtOrd) - lt)) rHead
      else null
    } else {
      var scanning = true
      while (scanning && rHead != null &&
        (rHead.isNullAt(rkOrd) || rHead.getLong(rkOrd) < lk)) adv()
      while (scanning && rHead != null && rHead.getLong(rkOrd) == lk) {
        if (rHead.isNullAt(rtOrd)) adv() // nulls sort first, never match
        else if (rHead.getLong(rtOrd) <= lt) {
          held = rHead.copy(); heldKey = lk
          heldTime = held.getLong(rtOrd); hasHeld = true
          adv()
        } else scanning = false
      }
      if (hasHeld && heldKey == lk && inBand(lt - heldTime)) held
      else null
    }
}

/** Optimizer hygiene for the custom node. A LogicalPlan Catalyst does
  * not know is an OPAQUE WALL: PushDownPredicates and ColumnPruning
  * both stop at it, so a filter written after the join runs after the
  * exchanges, and the scans read every column both inputs carry — at
  * 100 TB those are exactly the two plan properties that matter most.
  * A custom operator therefore ships WITH its optimizer rules (the
  * other half of ladder rung (c)); this one restores both:
  *
  *   - **Predicate pushdown**: deterministic conjuncts referencing only
  *     LEFT-side attributes move below the node (sound because the
  *     as-of emits exactly one row per left row, with left columns
  *     unchanged — filtering left inputs ≡ filtering outputs on left
  *     columns). Right-referencing conjuncts stay above: the right
  *     payload is null-extended and match-dependent, so pre-filtering
  *     the right child would CHANGE which row matches.
  *   - **Column pruning**: when a Project/Aggregate sits on the node,
  *     children are narrowed to referenced attributes + the join's
  *     key/time columns; Catalyst's own ColumnPruning then carries the
  *     inserted Project down to the scan's ReadSchema.
  *
  * Both rewrites run in one apply (push first, then prune) so a single
  * pass suffices even under a run-Once batch.
  */
object AsOfJoinRules extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = prune(push(plan))

  private def push(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val (pushable, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
  }

  private def prune(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoinNode) =>
      narrowed(j, p.references).map(n => p.copy(child = n)).getOrElse(p)
    case a @ Aggregate(_, _, j: AsOfJoinNode, _) =>
      narrowed(j, a.references).map(n => a.copy(child = n)).getOrElse(a)
  }

  /** Children narrowed to `parentRefs` + join columns; None if already
    * minimal (fixed point). */
  private def narrowed(j: AsOfJoinNode, parentRefs: AttributeSet): Option[AsOfJoinNode] = {
    val needed = parentRefs ++
      AttributeSet(Seq(j.leftKey, j.rightKey, j.leftTime, j.rightTime))
    def slim(c: LogicalPlan): LogicalPlan = {
      val kept = c.output.filter(needed.contains)
      if (kept.length == c.output.length) c else Project(kept, c)
    }
    val (nl, nr) = (slim(j.left), slim(j.right))
    if ((nl eq j.left) && (nr eq j.right)) None
    else Some(j.copy(left = nl, right = nr))
  }
}

/** User-facing API for the native as-of join. */
object NativeAsOfJoin {

  /** Idempotently install [[AsOfJoinStrategy]] and [[AsOfJoinRules]] on
    * a live session (the builder-time path is
    * `.withExtensions(new GraftExtensions)`). */
  def install(s: SparkSession): Unit = {
    GraftPlanBridge.addStrategy(s, AsOfJoinStrategy)
    GraftPlanBridge.addOptimization(s, AsOfJoinRules)
  }

  /** Left as-of join via the native operator. Same contract as the
    * compositional [[graft.operators.AsOfJoin.leftAsOf]]: right unique
    * per (key, time) for determinism; output = left.* ++ right.* (right
    * columns nullable — drop the right key/time if unwanted). Key and
    * time columns are referenced BY NAME on their own side, so the two
    * frames' column names may overlap freely except that callers should
    * rename collisions before selecting from the result.
    *
    * `forward = false` (default) matches the LATEST right row with
    * `rightTime <= leftTime`; `forward = true` matches the EARLIEST with
    * `rightTime >= leftTime` — pandas merge_asof's `direction`.
    * `tolerance` (merge_asof's `tolerance`) additionally requires
    * `|rightTime - leftTime| <= tolerance`, expressed in the time
    * column's own units; it needs a physically-long time column
    * (bigint / timestamp — epoch micros). */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    val s = left.sparkSession
    install(s)
    val lPlan = GraftPlanBridge.analyzed(left)
    val rPlan = GraftPlanBridge.analyzed(right)
    require(
      lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "left and right must not share attributes (self-as-of needs an " +
        "explicit right.toDF() re-alias to get fresh expression ids)")
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side column '$n' not found among ${p.output.map(_.name).mkString(", ")}"))
    val lk = attr(lPlan, leftKey, "left")
    val rk = attr(rPlan, rightKey, "right")
    val lt = attr(lPlan, leftTime, "left")
    val rt = attr(rPlan, rightTime, "right")
    require(lk.dataType == rk.dataType,
      s"key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"time types differ: ${lt.dataType} vs ${rt.dataType}")
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be non-negative, got $t")
      require(lt.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      }, s"tolerance needs a physically-long time column, got ${lt.dataType}")
    }
    GraftPlanBridge.ofRows(s,
      AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt, forward, tolerance))
  }
}
