package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable join operators Spark lacks natively, built scale-first from
  * composable primitives (preference (a) of the custom-operator ladder —
  * no custom SparkStrategy needed, SURVEY.md §7.2).
  */
object AsOfJoin {

  /** Left as-of join: for every left row, attach the payload columns of
    * the latest right row with the same key and `rightTime <= leftTime`
    * (nulls when none). Right must be unique per (key, time) — pre-reduce
    * ties upstream to keep results deterministic.
    *
    * Scale design: instead of an inequality join (cross-product risk) or
    * per-key collect, both sides are unioned and hash-shuffled ONCE by
    * key, then a single ordered window pass carries the last right payload
    * forward onto left rows. O(n log n) per key group, spillable,
    * skew-handled by AQE — the standard big-data as-of pattern.
    *
    * @param leftTime/rightTime numeric (e.g. epoch micros) columns;
    *   equal-time rows are matched inclusively (right sorts first).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: Column,
      rightTime: Column): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val reserved = Seq("_k", "_t", "_side") ++ payloadCols.map("_r_" + _)
    require(!left.columns.exists(reserved.contains),
      s"left input uses reserved working column names: ${reserved.mkString(",")}")
    require(payloadCols.intersect(left.columns).isEmpty,
      "left and right payload column names must be disjoint: " +
        payloadCols.intersect(left.columns).mkString(","))
    val lSide = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", leftTime)
      .withColumn("_side", lit(1))
    val lAligned = payloadCols.foldLeft(lSide) { (df, c) =>
      df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rAligned = {
      val base = right
        .withColumn("_k", col(rightKey))
        .withColumn("_t", rightTime)
        .withColumn("_side", lit(0))
      val renamed = payloadCols.foldLeft(base) { (df, c) =>
        df.withColumn(s"_r_$c", col(c))
      }
      // align to left's schema: left cols become nulls on right rows
      val nulled = left.columns.foldLeft(renamed) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      nulled.select(lAligned.columns.map(col).toSeq: _*)
    }
    val w = Window.partitionBy("_k").orderBy("_t", "_side")
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payloadCols.foldLeft(lAligned.unionByName(rAligned)) {
      (df, c) => df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("_side") === 1)
      .drop("_k", "_t", "_side")
    payloadCols.foldLeft(out)((df, c) => df.withColumnRenamed(s"_r_$c", c))
  }
}

object RangeJoin {

  /** Banded range join: pairs (a, b) with `a.key == b.key` and
    * `|aTime - bTime| <= tolerance`, without a per-key cross product.
    *
    * Scale design: bucket time by `tolerance`; the right side is exploded
    * into its bucket ±1, the left side keeps one bucket, and the join runs
    * on (key, bucket) — any qualifying pair lands in exactly one bucket
    * match, so no dedup is needed. Shuffle volume is 3× right + 1× left,
    * versus the unbounded blowup of a naive inequality join.
    *
    * Returns left.* plus right's columns renamed with `rPrefix`. Left
    * rows with no partner are kept (left outer), with nulls.
    */
  def bandedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTimeCol: String,
      rightTimeCol: String,
      tolerance: Long,
      rPrefix: String = "r_"): DataFrame = {
    require(tolerance > 0,
      "tolerance must be positive (a zero tolerance would divide by zero " +
        "in the bucketing; use an equi-join on the time column for exact matches)")
    val l = left.withColumn("_t", col(leftTimeCol).cast("long"))
      .withColumn("_bucket", floor(col("_t") / tolerance).cast("long"))
    val rBase = right.columns.foldLeft(right)(
      (df, c) => df.withColumnRenamed(c, rPrefix + c))
    val r = rBase.withColumn("_rt", col(rPrefix + rightTimeCol).cast("long"))
      .withColumn("_off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_bucket", col("_off") + floor(col("_rt") / tolerance).cast("long"))
      .drop("_off")
    l.join(r,
      l(key) === r(rPrefix + key) &&
        l("_bucket") === r("_bucket") &&
        abs(l("_t") - r("_rt")) <= tolerance,
      "left")
      .drop("_t", "_rt", "_bucket")
  }
}
