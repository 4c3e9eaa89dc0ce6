package graft.operators

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshaping + statistical moments: pivot (long→wide), unpivot
  * (wide→long), and exact second-moment statistics (stddev, correlation)
  * computed from decimal power sums so results are independent of
  * aggregation order — the same trick that makes plain sums
  * oracle-exact (see Relational).
  */
object Reshape extends QueryPack {

  import graft.functions.Exact.dec

  /** q55: pivot — monthly counts fanned into one column per event type.
    * Values are enumerated explicitly: at scale this avoids the extra
    * distinct-scan job and keeps the output schema stable. */
  private def q55(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("month")

  /** q56: unpivot (melt) — wide order attributes into (metric, value). */
  private def q56(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_custkey").cast("double").as("o_custkey_d"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("o_totalprice"), col("o_custkey_d")),
        "metric", "value")
      .orderBy("o_orderkey", "metric")

  /** q58: exact moments — mean, sample stddev, and corr(quantity, price)
    * per return flag from DECIMAL power sums (Σx, Σx², Σxy exact), final
    * formula evaluated in double with an identical expression tree to the
    * oracle. Built-in stddev/corr use streaming float accumulators whose
    * results depend on partition order — unusable for hash-compare. */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(dec(x)).cast("double").as("sx"),
        sum(dec(x) * dec(x)).cast("double").as("sxx"),
        sum(dec(y)).cast("double").as("sy"),
        sum(dec(y) * dec(y)).cast("double").as("syy"),
        sum(dec(x) * dec(y)).cast("double").as("sxy"))
      .select(col("l_returnflag"),
        col("n"),
        round(col("sx") / col("n"), 6).as("mean_qty"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n") * (col("n") - 1))), 6).as("std_qty"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** q147: `unionByName(allowMissingColumns = true)` — schema-drift
    * union IN MEMORY (the read-side twin is q132's mergeSchema): a lean
    * historical projection and a wide current projection combine by
    * column NAME, with the missing column null-filled. Position-based
    * union would silently misalign here; the gate pins the name-based
    * semantics and the null accounting per population. */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val old = ord.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val neu = ord.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderpriority"), col("o_totalprice"),
        col("o_orderkey")) // deliberately different column ORDER
    old.unionByName(neu, allowMissingColumns = true)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_priced"),
        round(sum(dec(col("o_totalprice"))).cast("double"), 2)
          .as("priced_total"))
      .orderBy("o_orderpriority")
  }

  /** q161: per-group ordinary least squares (y = extendedprice on
    * x = quantity) from exact DECIMAL power sums — slope, intercept,
    * and r² in the closed forms that need only (n, Σx, Σy, Σx², Σxy,
    * Σy²). One aggregation over the scan computes all five sums
    * map-side-partially; the regression arithmetic happens on five
    * exact decimals per group, so both engines evaluate the identical
    * expression tree on identical operands (the q58 moments
    * discipline — a builtin regr_slope's double accumulation would be
    * summation-order-dependent). */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    // n·Σx² − (Σx)² and the y twin — the denominators every closed form
    // below divides by
    val dxCol = col("n") * col("sxx") - col("sx") * col("sx")
    val dyCol = col("n") * col("syy") - col("sy") * col("sy")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(x * y).cast("double").as("sxy"),
        sum(y * y).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n").cast("long").as("n"),
        // degenerate groups (zero x- or y-variance: constant or single
        // observation) pin slope/intercept/r² to NULL explicitly on both
        // engines rather than relying on engine-specific x/0 behavior
        // (ADVICE r6 — same latent shape as q142's sigma guard)
        when(dxCol > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) / dxCol, 6))
          .as("slope"),
        when(dxCol > 0,
          round((col("sy") * col("sxx") - col("sx") * col("sxy")) / dxCol, 6))
          .as("intercept"),
        // both variances strictly positive (not just a positive product,
        // which FP cancellation could satisfy with two negatives — ADVICE r7)
        when(dxCol > 0 && dyCol > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy")) /
            (dxCol * dyCol), 6))
          .as("r2"))
      .orderBy("l_returnflag")
  }

  override def queries: Seq[Q] = Seq(
    Q("q161_linear_regression", q161, Some(
      """WITH s AS (SELECT l_returnflag,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) *
        |           CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) *
        |           CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN
        |    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN
        |    round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) END AS intercept,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
        |          ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin)),
    Q("q147_union_by_name", q147, Some(
      """WITH u AS (
        |  SELECT o_orderkey, o_orderpriority, NULL::DOUBLE AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  count(o_totalprice) AS n_priced,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS priced_total
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("q55_pivot", q55, Some(
      """SELECT strftime(ts, '%Y-%m') AS month,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("q56_unpivot", q56, Some(
      """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey_d', CAST(o_custkey AS DOUBLE) FROM orders
        |ORDER BY o_orderkey, metric""".stripMargin)),
    Q("q58_exact_moments", q58, Some(
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  round(sx / n, 6) AS mean_qty,
        |  round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6) AS std_qty,
        |  round((n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin)),
  )
}
