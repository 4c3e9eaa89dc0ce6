package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (`classic.ExpressionUtils`) for the classic (non-Connect) runtime.
  *
  * Spark 4 removed the public `new Column(expr: Expression)` constructor
  * (Columns are now backed by Connect-portable `ColumnNode`s), so library
  * code that builds a [[Column]] around a custom Catalyst expression has
  * two options: register a temp function and round-trip through SQL text
  * — which cannot carry non-SQL-expressible state like a closed-over
  * sketch without a name registry and its attendant lifecycle bugs
  * (rebind races, per-call registry leaks; see BloomFunctions' history) —
  * or convert directly. This object is the direct route: one line per
  * direction, no session state, no names to collide or leak. The
  * expression resolves at analysis like any built-in (unresolved
  * attributes inside it bind against the target frame).
  */
object GraftColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a (classic-runtime) Column to its Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
