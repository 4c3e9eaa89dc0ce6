package graft.operators

import graft.{Q, QueryPack}
import graft.Materialize.MaterializeOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators (as-of join, banded range join, gap-based
  * sessionization) — capabilities absent from the reference (its only
  * notion of time is a string prefix, SURVEY.md §1.1) but essential for
  * the events workload.
  */
object Temporal extends QueryPack {

  /** As-of join: each event picks up the latest order of the same
    * customer (user_id = o_custkey) with o_orderdate <= ts. Orders are
    * pre-reduced to one row per (custkey, date) — max orderkey — so the
    * match is deterministic. */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val ord = Tables.orders(s, dir)
      .groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("o_orderkey"))
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
        col("o_orderkey"))
    AsOfJoin.leftAsOf(ev, ord, "user_id", "o_custkey",
        col("us"), col("o_us"))
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("asof_orderkey"))
      .orderBy("event_id")
  }

  /** Banded range join: per event, how many other events of the same user
    * fall within ±1 hour. */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    // Conditional count, not a pre-filter: an event whose only in-band
    // match is itself must still appear with n_neighbors = 0.
    RangeJoin.bandedJoin(ev, ev, "user_id", "us", "us", hourUs)
      .groupBy("event_id")
      .agg(count(when(col("r_event_id") =!= col("event_id"), lit(1)))
        .as("n_neighbors"))
      .orderBy("event_id")
  }

  /** Gap-based sessionization: a new session starts after >30 min of user
    * inactivity. Pure window composition — at scale this is one shuffle
    * by user + ordered pass (what Structured Streaming's session_window
    * does for the streaming case, see streaming pack). */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(col("us") - lag("us", 1).over(wOrd) > gapUs, 1L)
          .when(lag("us", 1).over(wOrd).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum("new_sess").over(wRun))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"),
        (max("us") - min("us")).as("dur_us"))
      .orderBy("user_id", "session_no")
  }

  /** Decay base and window for q122. The coefficient table is built from
    * EXACT DECIMAL powers of 0.8 (BigDecimal, not `math.pow` on the
    * inexact binary 0.8) so the literals — and therefore every product —
    * are the same doubles the oracle's spelled-out decimal list parses
    * to. */
  private val DecayN = 10
  private val decayCoefs: Seq[java.math.BigDecimal] =
    (0 until DecayN).map(j => new java.math.BigDecimal("0.8").pow(j))

  /** q122: time-decayed rolling feature — per event, the exponentially
    * decayed sum of the user's last 10 values (decay 0.8 per step,
    * current event weighted 1). The standard online-feature shape
    * (recency-weighted engagement) computed batch-side: a bounded
    * 10-element `collect_list` window (state per row is fixed — never
    * the user's history) followed by a sequential weighted fold, both
    * engines evaluating the identical literal coefficients in the
    * identical order. One hash shuffle on user_id; map-only after. */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-(DecayN - 1), Window.currentRow)
    val coefArr = array(decayCoefs.map(c => lit(c.doubleValue)): _*)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("vs", collect_list("value").over(w))
      .withColumn("coefs", coefArr)
      .select(col("user_id"), col("event_id"),
        size(col("vs")).cast("long").as("n_window"),
        round(expr(
          "aggregate(sequence(1, size(vs)), 0.0D, (acc, i) -> " +
            "acc + element_at(vs, i) * element_at(coefs, size(vs) - i + 1))"),
          6).as("decayed"))
      .orderBy("user_id", "event_id")
  }

  /** q130: behavioral funnel via ordered-path pattern matching — which
    * users performed click → view → purchase IN THAT ORDER (with
    * anything between). There is no MATCH_RECOGNIZE in Spark; the
    * portable formulation is the ordered event-type path per user (one
    * shuffle + per-user sort, the sessionize shape) matched with a
    * regex. The path string is bounded by a user's event count — for
    * 100 TB clickstreams the same query runs per (user, day) partition
    * to cap path length. Output: per-user funnel stage reached, counted.
    */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy("user_id").orderBy("us", "event_id")
    val path = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      // first 8 events only, RANKED BEFORE the aggregation (the q92
      // discipline): the collect_list buffer holds ≤ 8 survivors, never
      // a power user's full history — and 8 events is enough path for
      // the funnel to differ across users (every long-enough history
      // trivially matches everything). The window's hash partitioning
      // is reused by the groupBy — one shuffle total.
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") <= 8)
      .groupBy("user_id")
      .agg(concat_ws(",",
        array_sort(collect_list(struct(col("rn"), col("event_type"))))
          .getField("event_type")).as("path"))
    path.select(col("user_id"),
      when(col("path").rlike("click.*view.*purchase"), "full_funnel")
        .when(col("path").rlike("click.*view"), "click_view")
        .when(col("path").rlike("click"), "click_only")
        .otherwise("no_click").as("stage"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** q165: MATCH_RECOGNIZE-style time-constrained funnel — the
    * sequence-detection shape q130's regex-over-path can't express:
    * each step must occur within a DEADLINE of the previous one.
    * Semantics: per user, the FIRST click, then the first view within 7
    * days AFTER that click, then the first purchase within 7 days after
    * that view — anchored at the first click with NO backtracking to
    * later clicks (the product-analytics attribution convention; a full
    * MATCH_RECOGNIZE would retry the pattern from each row, which at
    * clickstream scale is exactly the per-row fan-out this formulation
    * avoids). Spark has
    * no MATCH_RECOGNIZE; the portable plan is three chained conditional
    * mins, each a groupBy on user_id. Aggregation state per user is a
    * single timestamp per stage — never a collected path or a buffered
    * partition, which is why this survives 100 TB clickstreams where
    * q130's collect_list (or a window over the full user partition)
    * would not. Each stage scans only its pushed-down event_type slice
    * (plan audit: `PushedFilters: EqualTo(event_type, ...)`, 3-column
    * ReadSchema); the tiny per-user stage frames (two longs per user)
    * are eagerly checkpointed so their subtrees aren't recomputed where
    * reused (the q169 baskets discipline) — exactly one scan per stage
    * — and AQE broadcast-joins them back against the next slice. */
  private def q165(s: SparkSession, dir: String): DataFrame = {
    val stepUs = 7L * 86400L * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("us").as("c_us"))
      .materialized
    val views = ev.filter(col("event_type") === "view")
      .join(clicks, "user_id")
      .filter(col("us") > col("c_us") && col("us") <= col("c_us") + stepUs)
      .groupBy("user_id").agg(min("us").as("v_us"))
      .materialized
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(views, "user_id")
      .filter(col("us") > col("v_us") && col("us") <= col("v_us") + stepUs)
      .groupBy("user_id").agg(min("us").as("p_us"))
    clicks
      .join(views, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("p_us").isNotNull, "converted")
          .when(col("v_us").isNotNull, "viewed")
          .otherwise("clicked").as("stage"),
        col("c_us"), col("v_us"), col("p_us"),
        (col("p_us") - col("c_us")).as("convert_us"))
      .orderBy("user_id")
  }

  /** q183: bounded backtracking sequence match — the MATCH_RECOGNIZE
    * semantics q165 deliberately avoids (pattern retry from EVERY
    * candidate anchor, not just the first), made scale-safe by bounding
    * the search to a per-(user, day) window. Pattern: click then view
    * then purchase, leftmost-first with backtracking — the match regex
    * `c.*?v.*?p` would report: the EARLIEST click from which the full
    * sequence completes, then the earliest completing view after it,
    * then the earliest purchase after that view. A naive evaluation
    * retries the pattern from each row (quadratic per partition); this
    * plan is two linear suffix scans instead: ordered DESC within each
    * (user, day), a windowed conditional min finds each row's next
    * purchase, a second windowed min (same partitioning+ordering — no
    * new exchange or sort) finds each row's next COMPLETING view with
    * its purchase carried in the struct, and a lexicographic min-struct
    * aggregation picks the anchor click. ONE hash exchange on
    * (user_id, day) feeds both windows and the final aggregation; state
    * is O(1) per row, never a buffered path. The oracle runs the actual
    * regex over each day's event-letter path (lazy groups reproduce
    * leftmost-first-with-backtracking exactly) and indexes the matched
    * offsets back into the ordered timestamp list. Ties in `us` break
    * by event_id on both engines. */
  private def q183(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
    // DESC ordering makes "rows preceding" = "events strictly later":
    // each windowed min is a suffix scan in event-time order
    val w = Window.partitionBy("user_id", "day")
      .orderBy(col("us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withP = ev.withColumn("next_p",
      min(when(col("event_type") === "purchase",
        struct(col("us"), col("event_id")))).over(w))
    val withV = withP.withColumn("next_vp",
      min(when(col("event_type") === "view" && col("next_p").isNotNull,
        struct(col("us"), col("event_id"),
          col("next_p.us").as("p_us")))).over(w))
    withV.filter(col("event_type") === "click" && col("next_vp").isNotNull)
      .groupBy("user_id", "day")
      .agg(min(struct(col("us").as("c_us"), col("event_id").as("c_id"),
        col("next_vp.us").as("v_us"),
        col("next_vp.p_us").as("p_us"))).as("m"))
      .select(col("user_id"), col("day"), col("m.c_us").as("c_us"),
        col("m.v_us").as("v_us"), col("m.p_us").as("p_us"))
      .orderBy("user_id", "day")
  }

  /** q140: cohort retention — the canonical product-analytics matrix.
    * The qualifying activity is the sparse high-value subset (value >
    * 190 — a pushed-down scan filter), because the fixture's users fire
    * every day and an unfiltered daily cohort would be degenerate. Each
    * user's cohort is their first qualifying DAY (a per-user min — one
    * shuffle on user_id); retention cell (cohort, days_since) counts
    * distinct users qualifying that many days later. At 100 TB the
    * expensive step is the distinct-users count, and it rides on the
    * SAME user_id-keyed exchange as the cohort min; the matrix itself is
    * tiny (days × days). Day-truncated timestamp difference is exact
    * integer arithmetic — no sub-day fraction wobble. */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value") > 190)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val cohort = ev.groupBy("user_id").agg(min("d").as("cohort_d"))
    ev.join(cohort, "user_id")
      .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort"),
        datediff(col("d"), col("cohort_d")).cast("long").as("days_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "days_since")
  }

  /** q143: gaps-and-islands — per-user runs of CONSECUTIVE qualifying
    * days, via the classic `value − dense_rank()` grouping trick (a
    * constant within each island). Qualifying days are the same sparse
    * high-value subset as q140 (unfiltered, the fixture's users are
    * active every day and every streak would be the full span).
    * Everything after the initial distinct stays partitioned on
    * user_id — the window, both aggregates, and the final sort feed off
    * one exchange. The output is per-user streak stats, the shape
    * engagement pipelines feed into churn models. */
  private def q143(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.events(s, dir)
      .filter(col("value") > 190)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")),
          lit("2024-01-01").cast("date")).as("dn"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("dn")
    m.withColumn("grp", col("dn") - dense_rank().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"),
        sum("len").as("n_active_days"))
      .orderBy("user_id")
  }

  /** q154: interval concurrency via SWEEP-LINE — how many orders are
    * "active" at once, where each order is active for 1 + o_orderkey%5
    * days. The naive plan explodes every interval into its covered days
    * (per-row fan-out ∝ duration — unbounded at 100 TB); the sweep-line
    * instead emits ±1 deltas at interval endpoints and takes a running
    * sum, so work is 2 rows per interval REGARDLESS of duration. The
    * running window partitions by priority — concurrency is tracked per
    * key, never through one global single-partition sort. */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderpriority").as("prio"),
      to_date(col("o_orderdate")).as("start_d"),
      date_add(to_date(col("o_orderdate")),
        (lit(1) + col("o_orderkey") % 5).cast("int")).as("end_d"))
    val deltas = o.select(col("prio"), col("start_d").as("d"), lit(1L).as("delta"))
      .unionByName(o.select(col("prio"), col("end_d").as("d"),
        lit(-1L).as("delta")))
      .groupBy("prio", "d").agg(sum("delta").as("net"))
    val w = Window.partitionBy("prio").orderBy("d")
    deltas.withColumn("active", sum("net").over(w))
      .select(col("prio"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("net"), col("active"))
      .orderBy("prio", "day")
  }

  /** q156: date-spine gap filling — the time-series completion pattern:
    * LEFT-join daily counts onto a generated continuous day spine so
    * zero-activity days surface as explicit rows (rolling averages and
    * downstream models need the zeros). The spine generates from each
    * priority's OWN min/max via `sequence` — one row per priority
    * explodes into its span, so there is no global 1-row broadcast and
    * no driver collect; spine size is days × priorities, trivially
    * bounded. */
  private def q156(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderpriority").as("prio"),
      to_date(col("o_orderdate")).as("d"))
    val daily = o.groupBy("prio", "d").agg(count(lit(1)).as("n"))
    val spine = o.groupBy("prio")
      .agg(min("d").as("min_d"), max("d").as("max_d"))
      .select(col("prio"),
        explode(expr("sequence(min_d, max_d, interval 1 day)")).as("d"))
    spine.join(daily, Seq("prio", "d"), "left")
      .select(col("prio"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("prio", "day")
  }

  /** q159: forward fill (LOCF — last observation carried forward) over
    * the q156 date spine: gap days surface NULL, then
    * `last(ignoreNulls)` over a running frame carries the previous
    * observed value forward — the standard time-series imputation
    * before feature extraction. The window shares the spine's key
    * partitioning; days before the first observation stay at the -1
    * sentinel. Observed values are raw-double maxima (no arithmetic),
    * so the carry is bit-exact. */
  private def q159(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderpriority").as("prio"),
      to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
    val daily = o.groupBy("prio", "d").agg(max("o_totalprice").as("v"))
    val spine = o.groupBy("prio")
      .agg(min("d").as("min_d"), max("d").as("max_d"))
      .select(col("prio"),
        explode(expr("sequence(min_d, max_d, interval 1 day)")).as("d"))
    val w = Window.partitionBy("prio").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("prio", "d"), "left")
      .select(col("prio"), col("d"), col("v"),
        coalesce(last(col("v"), ignoreNulls = true).over(w), lit(-1.0))
          .as("filled"),
        col("v").isNotNull.as("observed"))
      .select(col("prio"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("filled"), col("observed"))
      .orderBy("prio", "day")
  }

  /** q169: market-basket co-occurrence with lift — association mining
    * over (user, day) baskets: for every event-type pair, support and
    * lift = P(ab)/(P(a)P(b)). The pair join keys on the basket id and
    * the type alphabet is tiny, so pair fan-out per basket is C(k,2)
    * with k ≤ |event types| — bounded by the VOCABULARY, not the data;
    * the basket total rides the 1-row broadcast (q69 pattern). Lift
    * arithmetic happens on exact integer counts; one final rounded
    * division. */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct()
      .materialized
    val nBaskets = baskets.select("user_id", "d").distinct()
      .agg(count(lit(1)).as("nb"))
    val typeCounts = baskets.groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n_t"))
    val pairs = baskets.as("x")
      .join(baskets.as("y"),
        col("x.user_id") === col("y.user_id") && col("x.d") === col("y.d") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(typeCounts.withColumnRenamed("t", "ta")
        .withColumnRenamed("n_t", "n_a")), "ta")
      .join(broadcast(typeCounts.withColumnRenamed("t", "tb")
        .withColumnRenamed("n_t", "n_b")), "tb")
      .crossJoin(broadcast(nBaskets))
      .select(col("ta"), col("tb"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab") * col("nb") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy("ta", "tb")
  }

  /** q194: SCD2 history build — the warehouse pattern that turns an
    * event log into type-2 dimension rows: per user, consecutive runs
    * of the tracked attribute (event_type) collapse into one version
    * with [valid_from, valid_to) validity, valid_to = the next
    * version's start (sentinel -1 while current). Gaps-and-islands via
    * the lag≠current change flag + running sum = version id, then the
    * run aggregate and the lead(valid_from) window — ALL of it rides
    * ONE hash exchange on user_id (the change-flag window, the
    * version-id sum, the per-version aggregate, and the lead share the
    * same partitioning; Catalyst plans no second exchange). At scale
    * the only cost is that shuffle plus per-user sorted scans — the
    * canonical MERGE-free SCD2 build. Ties (equal us) are broken by
    * event_id for a total per-user order. */
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"),
          lit(1)).otherwise(lit(0)))
      .withColumn("version",
        sum(col("chg")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = e.groupBy("user_id", "version")
      .agg(first(col("event_type")).as("event_type"),
        min(struct(col("us"), col("event_id"))).as("k"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("version"), col("event_type"),
        col("k.us").as("valid_from"), col("n_events"))
    val byUserRun = Window.partitionBy("user_id").orderBy("valid_from")
    runs
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(byUserRun), lit(-1L)))
      .withColumn("is_current", col("valid_to") === -1L)
      .select("user_id", "version", "event_type", "valid_from",
        "valid_to", "n_events", "is_current")
      .orderBy("user_id", "version")
  }

  /** q205: position-based (U-shaped) conversion attribution — the
    * marketing-analytics allocation that splits each purchase's credit
    * across the clicks in its preceding 5-day consideration window:
    * 40% to the first touch,
    * 40% to the last, the middle 20% spread evenly over interior
    * clicks (n=1 → 100%, n=2 → 50/50). The join is q84/q173's batch
    * shape — user equi-join with a residual event-time band, never an
    * inequality cross product — and the position/count windows ride
    * one exchange keyed on the purchase. Weights are exact rational
    * arithmetic in double, rounded once (both engines compute the
    * identical 0.2/(n−2) quotient). Same 50% user stratum as the
    * streaming join gates. */
  private def q205(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(pmod(col("user_id"), lit(2)) === 0)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("us").as("c_us"))
    val wP = Window.partitionBy("p_id").orderBy(col("c_us"), col("c_id"))
    val joined = p.join(c, Seq("user_id"))
      .filter(col("c_us") >= col("p_us") - 432000000000L &&
        col("c_us") <= col("p_us"))
      .withColumn("rn", row_number().over(wP))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("p_id")))
    joined.select(col("p_id"), col("c_id"),
      round(
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2)), 6).as("credit"))
      .orderBy("p_id", "c_id")
  }

  /** q224: OHLC downsampling — the classic time-series resample
    * (open/high/low/close + mean per (series, day) bar) that turns a
    * tick stream into candles. The scale point is HOW open/close are
    * picked: `min_by`/`max_by` with a (us, event_id) struct ordering key
    * are one-pass, partial-aggregable argmin/argmax (q141's discipline) —
    * the whole bar is ONE map-side-combined aggregation, where the naive
    * row_number-window formulation (which the ORACLE deliberately runs)
    * sorts every row of every bar. Ties at the same microsecond break by
    * event_id, so first/last are total-order deterministic. The mean
    * runs through an exact DECIMAL sum divided once (q109's discipline). */
  private def q224(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
    ev.groupBy("event_type", "day").agg(
      min_by(col("value"), struct(col("us"), col("event_id"))).as("open"),
      max("value").as("high"), min("value").as("low"),
      max_by(col("value"), struct(col("us"), col("event_id"))).as("close"),
      count(lit(1)).as("n_events"),
      round(sum(col("value").cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 6).as("avg_value"))
      .orderBy("event_type", "day")
  }

  /** q228: rolling robust anomaly detection — per (event_type, day)
    * volumes scored against the trailing 7 days' median/MAD: robust z =
    * (n − med) / (1.4826·MAD), flag |z| > 3.5 (Iglewicz–Hoaglin). The
    * monitoring primitive a pipeline runs over every partition's row
    * counts: median/MAD shrug off the spike being scored (breakdown 50%),
    * where a rolling mean/stddev (q122's EWMA family) drags the baseline
    * toward the outlier it should flag.
    *
    * Scale shape: the corpus collapses to the (type, day) count frame in
    * one map-side-combined shuffle; the rolling window then carries a
    * BOUNDED ≤7-element list per row (collect_list over RANGE BETWEEN 7
    * PRECEDING AND 1 PRECEDING on the NUMERIC day — state is at most 7
    * longs, never a group scan), and the exact median/MAD come from
    * sort_array + element_at on that constant-size array via codegen'd
    * higher-order functions. The frame is RANGE-based on day number, not
    * ROWS-based: a type with missing days must NOT silently stretch its
    * "trailing 7 days" across more than 7 calendar days (ADVICE r11) —
    * under the range frame a gap shrinks the baseline instead, and the
    * completeness filter (exactly 7 observations in the 7 calendar days)
    * then guarantees every scored row has a gap-free week behind it. All
    * inputs to the flag are exact integers; doubles enter only at z.
    * Rows without that full history emit nothing (no partial-window
    * false positives); a zero-MAD baseline falls back to flagging any
    * deviation from the constant. */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        (unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day_num"))
      .agg(count(lit(1)).as("n"))
    val w7 = Window.partitionBy("event_type").orderBy("day_num")
      .rangeBetween(-7, -1)
    val med = element_at(sort_array(col("arr")), 4)
    val z = (col("n") - col("med")) / (lit(1.4826) * col("mad"))
    daily
      .withColumn("arr", collect_list("n").over(w7))
      .filter(size(col("arr")) === 7)
      .withColumn("med", med)
      .withColumn("mad", element_at(sort_array(
        transform(col("arr"), v => abs(v - col("med")))), 4))
      .select(col("event_type"),
        date_format(timestamp_micros(col("day_num") * lit(86400000000L)),
          "yyyy-MM-dd").as("day"),
        col("n"), col("med"), col("mad"),
        when(col("mad") > 0, round(z, 6)).as("robust_z"),
        when(col("mad") === 0, col("n") =!= col("med"))
          .otherwise(abs(z) > 3.5).as("anomaly"))
      .orderBy("event_type", "day")
  }

  /** q232: feature-store POINT-IN-TIME enrichment — each event picks up
    * the dimension version that was valid AT its timestamp (the lookup
    * every training pipeline needs to avoid feature leakage: joining
    * "current" attributes onto historical facts trains on the future).
    * The dimension is an SCD2-style version history derived in-flight
    * from orders: customer k's i-th order (by date, orderkey) opens
    * version i with attributes (n_orders = i, tier_price), valid until
    * the next order's date.
    *
    * Scale design: NOT an interval join — a key-equi join against a
    * versioned dimension multiplies |facts per key| × |versions per key|
    * before the interval filter prunes, and a general range join is
    * worse. Instead the as-of UNION-WINDOW shape (q35's trick,
    * generalized to in-flight SCD2): version-open rows and fact rows
    * union into ONE frame, one shuffle on the key, and a per-key ordered
    * window carries the last-opened version forward onto each fact via
    * `last(_, ignoreNulls)`. Work is O((|facts|+|versions|) log) per
    * key with no pair blowup; ordering (us, kind, ok) makes a version
    * opening at exactly the fact's timestamp visible to it (valid_from
    * inclusive) and the later of two same-instant versions win — exactly
    * the empty-interval semantics of the oracle's half-open [vf, vt)
    * join. Events before a user's first version (or with no customer
    * match at all) keep NULLs: the leakage-critical "no data yet" case. */
  private def q232(s: SparkSession, dir: String): DataFrame = {
    val wVer = Window.partitionBy("user_id").orderBy("us", "ok")
    val dim = Tables.orders(s, dir)
      .select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderkey").as("ok"),
        round(col("o_totalprice"), 2).as("tier_price"))
      .withColumn("n_orders", row_number().over(wVer).cast("long"))
      .select(col("user_id"), col("us"), lit(0).as("kind"), col("ok"),
        col("n_orders"), col("tier_price"),
        lit(null).cast("long").as("event_id"))
    val fact = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        lit(1).as("kind"), col("event_id").as("ok"),
        lit(null).cast("long").as("n_orders"),
        lit(null).cast("double").as("tier_price"), col("event_id"))
    val wAsOf = Window.partitionBy("user_id").orderBy("us", "kind", "ok")
      .rowsBetween(Window.unboundedPreceding, 0)
    dim.unionByName(fact)
      .withColumn("v", last(col("n_orders"), ignoreNulls = true).over(wAsOf))
      .withColumn("p", last(col("tier_price"), ignoreNulls = true).over(wAsOf))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("v").as("n_orders"),
        col("p").as("tier_price"), col("v").isNotNull.as("has_dim"))
      .orderBy("event_id")
  }

  /** q234: engagement stickiness — per day, DAU, trailing-7-day WAU and
    * the DAU/WAU ratio. Rolling DISTINCT counts don't decompose from
    * daily tallies (a user active twice in the window must count once),
    * so the exact scale plan is the fan-out trick: each distinct
    * (day, user) activity contributes itself to the 7 window-end days it
    * falls into (`explode` of a 7-element sequence), then one distinct +
    * count per (window_end, user). Work is a constant 7× the user-day
    * frame — already |users|-bounded per day — vs the quadratic blowup
    * of a per-day range self-join; window ends with no 7 full days of
    * history are dropped so every ratio is over a complete window. */
  private def q234(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select((unix_micros(col("ts")) / lit(86400000000L))
        .cast("long").as("day"), col("user_id"))
      .distinct()
    val bounds = ud.agg(min("day").as("d0"), max("day").as("d1"))
    val wau = ud
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
        col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    dau.join(wau, "day")
      .join(broadcast(bounds),
        col("day") >= col("d0") + 6 && col("day") <= col("d1"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  /** q245: time-weighted average (TWAP) over irregular ticks — the
    * correct "average value" when observations arrive unevenly: each
    * reading holds until the NEXT one, so it is weighted by its dwell
    * time (the last reading of a day holds to day end). One window
    * exchange on (series, day) supplies lead(); the weighted sums are
    * exact DECIMAL cents × integer microseconds, so both engines add
    * identical integers and the single double division happens once at
    * the edge. The plain AVG — which a naive pipeline would compute —
    * is emitted alongside so the gate also demonstrates WHY the
    * distinction matters (they differ whenever value correlates with
    * arrival gaps). */
  private def q245(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("day", (col("us") / dayUs).cast("long"))
      .withColumn("dwell",
        coalesce(lead(col("us"), 1).over(w), (col("day") + 1) * dayUs) -
          col("us"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_ticks"),
        round((sum(col("v") * col("dwell")).cast("double") /
          sum(col("dwell"))), 6).as("twap"),
        // exact decimal sum over the count — never a double-accumulated
        // avg(), whose partial-sum order differs per engine
        round(sum(col("v")).cast("double") / count(lit(1)), 6)
          .as("naive_avg"))
      .orderBy("event_type", "day")
  }

  /** q246: first-order Markov transition matrix over each user's
    * event-type sequence — P(next | current) estimated from ordered
    * per-user streams, the building block of next-action models and
    * session-anomaly scoring. One window exchange on user_id supplies
    * lead(); counting then collapses to the (cur, next) frame (≤
    * |types|² rows), where the row-conditional normalization runs as a
    * window over that TINY frame — the corpus is never re-shuffled.
    * Last events (no successor) drop out identically on both engines. */
  private def q246(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wCur = Window.partitionBy("cur")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("next", lead(col("event_type"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") / sum(col("n")).over(wCur).cast("double"), 6))
      .orderBy("cur", "next")
  }

  /** q248: the BATCH spelling of `session_window` — the same built-in
    * that powers the streaming gate (q177) also runs in plain groupBy,
    * and pinning it against the oracle's explicit gaps-and-islands SQL
    * proves the engine's session semantics (window end = last event +
    * gap; same-timestamp events never split) match the hand-rolled
    * q37/q143 machinery. Plans as one exchange on user_id + the
    * session-merging aggregate — no self-join, no second pass. */
  private def q248(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("ss_us"),
        unix_micros(col("session_window.end")).as("se_us"),
        col("n_events"))
      .orderBy("user_id", "ss_us")
  }

  /** q281: the NATIVE as-of join operator (q35's semantics through
    * [[graft.plans.NativeAsOfJoin]] — custom LogicalPlan + SparkStrategy
    * + physical merge exec, preference (c) of the custom-operator
    * ladder) feeding a downstream PER-KEY aggregate. The aggregate is
    * the point: the exec reports the left child's hash partitioning as
    * its output partitioning, so the groupBy(user_id) plans with NO
    * additional exchange — one shuffle per side total, where the
    * union-window shape (q35) re-shuffles for any downstream grouped
    * consumer because its partitioning died with the internal `_k`
    * column. AsOfJoinNativeSpec pins exec presence, result equality
    * with the compositional path, and the exchange count. */
  private def q281(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val ord = Tables.orders(s, dir)
      .groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("o_orderkey"))
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
        col("o_orderkey"))
    graft.plans.NativeAsOfJoin
      .leftAsOf(ev, ord, "user_id", "o_custkey", "us", "o_us")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(col("o_orderkey")).as("n_matched"),
        count(when(col("us") - col("o_us") <= lit(30L * 86400L * 1000000L),
          lit(1))).as("n_recent"))
      .orderBy("user_id")
  }

  /** q283: optimizer rules THROUGH the custom node — the filter is
    * written AFTER the as-of join and both inputs are fed RAW (6
    * columns each): without [[graft.plans.AsOfJoinRules]] the custom
    * node is an opaque wall (the user_id filter would run after both
    * exchanges; both scans would read every column). With the rules
    * the deterministic left-only conjunct moves below the node (1 in
    * 10 users survive — the left exchange shrinks 10×) and the
    * children are pruned to referenced + join columns, which built-in
    * ColumnPruning then carries into the scans' ReadSchema (events
    * 6→2, orders 6→2 columns). Output is deliberately insensitive to
    * the orders (custkey, date) tie-break: only the matched DATE is
    * used, never the orderkey. AsOfJoinNativeSpec pins the rewritten
    * plan shape; the oracle pins values. */
  private def q283(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val ord = Tables.orders(s, dir)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    graft.plans.NativeAsOfJoin
      .leftAsOf(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate")
      .filter(col("user_id") % 10 === 3)
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"))
      .agg(count(lit(1)).as("n_events"),
        count(col("o_orderdate")).as("n_matched"),
        count(when(unix_micros(col("ts")) - unix_micros(col("o_orderdate")) <=
          lit(30L * 86400L * 1000000L), lit(1))).as("n_recent"))
      .orderBy("week")
  }

  /** q282: FORWARD as-of with a 7-day tolerance through the NATIVE
    * operator — q249's semantics (next order of the same customer
    * within the band, else NULL) via `AsOfJoinExec(forward = true,
    * tolerance = 7d)` instead of the union-window shape. Forward is
    * the operator's cheapest mode: the merge holds NO candidate copy at
    * all — the right lookahead row itself is the unique earliest
    * qualifying match and stays unconsumed for the next left row. The
    * tolerance is an O(1) bound check at emit, not a join-shape change
    * (contrast q36's banded equi-join, which pays a 3× fan-out to
    * bound BOTH directions for pair ENUMERATION — here each left row
    * takes one partner, so no fan-out is ever needed). */
  private def q282(s: SparkSession, dir: String): DataFrame = {
    val tolUs = 7L * 86400L * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val ord = Tables.orders(s, dir)
      .groupBy("o_custkey", "o_orderdate")
      .agg(min("o_orderkey").as("o_orderkey"))
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
        col("o_orderkey"))
    graft.plans.NativeAsOfJoin
      .leftAsOf(ev, ord, "user_id", "o_custkey", "us", "o_us",
        forward = true, tolerance = Some(tolUs))
      .select(col("event_id"), col("user_id"),
        coalesce(col("o_orderkey"), lit(-1L)).as("next_orderkey"),
        coalesce(col("o_us") - col("us"), lit(-1L)).as("wait_us"))
      .orderBy("event_id")
  }

  /** q249: FORWARD as-of join with a tolerance band — each event picks
    * the NEXT order of the same customer (earliest o_orderdate ≥ ts),
    * but only if it lands within 7 days; otherwise NULL. Completes the
    * as-of matrix next to q35 (backward, unbounded): direction and
    * tolerance are the two knobs of a feature-store/fill lookup
    * (pandas merge_asof's `direction`/`tolerance`). Same union-window
    * shape as q232 — one shuffle on the key, scan DESCENDING so
    * `last(ignoreNulls)` always holds the EARLIEST qualifying order
    * (min (o_us, orderkey) among those ≥ the event; dim rows sort
    * before facts at equal instants so equality matches) — never the
    * versions×facts equi-join blowup. The tolerance is applied to the
    * matched candidate afterwards, which is equivalent: any order
    * inside the band is earlier than one beyond it. */
  private def q249(s: SparkSession, dir: String): DataFrame = {
    val tolUs = 7L * 86400L * 1000000L
    val dim = Tables.orders(s, dir)
      .select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        lit(0).as("kind"), col("o_orderkey").as("ok"),
        lit(null).cast("long").as("event_id"))
    val fact = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        lit(1).as("kind"), col("event_id").as("ok"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("kind"), col("ok").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    dim.unionByName(fact)
      .withColumn("cand_ok",
        last(when(col("kind") === 0, col("ok")), ignoreNulls = true).over(w))
      .withColumn("cand_us",
        last(when(col("kind") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"),
        when(col("cand_us") - col("us") <= tolUs, col("cand_ok"))
          .otherwise(lit(null)).as("next_orderkey"),
        when(col("cand_us") - col("us") <= tolUs, col("cand_us") - col("us"))
          .otherwise(lit(null)).as("wait_us"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("next_orderkey"), lit(-1L)).as("next_orderkey"),
        coalesce(col("wait_us"), lit(-1L)).as("wait_us"))
      .orderBy("event_id")
  }

  /** q253: LINEAR interpolation of masked points in a daily series —
    * the imputation tier above q159's LOCF (step-hold): a missing day
    * takes the line between its nearest observed neighbors. Every 3rd
    * day of the per-type daily cent sums is deterministically masked,
    * interpolated from the surviving points, and compared against the
    * ACTUAL value it was hiding — so the gate measures interpolation
    * error rather than assuming the method. One (type)-keyed window
    * exchange serves both neighbor lookups (prev = last-observed
    * ignoreNulls over the preceding frame, next = first-observed over
    * the following frame; day and value pick from the same row because
    * both are non-null exactly on observed rows). Integer cents until
    * the single slope division, identically parenthesized on both
    * engines. */
  private def q253(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        (unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum(col("cents")).as("cents"))
      .withColumn("obs", pmod(col("day"), lit(3)) =!= 0)
    val wPrev = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(1, Window.unboundedFollowing)
    val interp = col("pc") +
      (col("nc") - col("pc")) * (col("day") - col("pd")) /
        (col("nd") - col("pd"))
    daily
      .withColumn("pd", last(when(col("obs"), col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("pc", last(when(col("obs"), col("cents")), ignoreNulls = true).over(wPrev))
      .withColumn("nd", first(when(col("obs"), col("day")), ignoreNulls = true).over(wNext))
      .withColumn("nc", first(when(col("obs"), col("cents")), ignoreNulls = true).over(wNext))
      .filter(!col("obs") && col("pd").isNotNull && col("nd").isNotNull)
      .select(col("event_type"), col("day"), col("cents").as("actual_cents"),
        round(interp, 6).as("interp_cents"),
        round(abs(col("cents") - interp), 6).as("abs_err"))
      .orderBy("event_type", "day")
  }

  override def queries: Seq[Q] = Seq(
    Q("q253_linear_interp", q253, Some(
      """WITH d AS (SELECT event_type,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT *, day % 3 <> 0 AS obs FROM d),
        |n AS (SELECT event_type, day, cents, obs,
        |    last_value(CASE WHEN obs THEN day END IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
        |    last_value(CASE WHEN obs THEN cents END IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
        |    first_value(CASE WHEN obs THEN day END IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd,
        |    first_value(CASE WHEN obs THEN cents END IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc
        |  FROM m)
        |SELECT event_type, day, cents AS actual_cents,
        |  round(pc + (nc - pc) * (day - pd) / (nd - pd), 6)
        |    AS interp_cents,
        |  round(abs(cents - (pc + (nc - pc) * (day - pd) / (nd - pd))), 6)
        |    AS abs_err
        |FROM n
        |WHERE NOT obs AND pd IS NOT NULL AND nd IS NOT NULL
        |ORDER BY event_type, day""".stripMargin)),
    Q("q248_batch_session_window", q248, Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |           IS NULL
        |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |           > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (SELECT user_id, us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(us) AS ss_us,
        |  max(us) + 1800000000 AS se_us, count(*) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, ss_us""".stripMargin)),
    Q("q281_asof_native", q281, Some(
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |o AS (SELECT o_custkey, epoch_us(o_orderdate) AS o_us,
        |    max(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2),
        |j AS (SELECT ev.event_id, ev.user_id, ev.us, o.o_us, o.o_orderkey,
        |    row_number() OVER (PARTITION BY ev.event_id
        |      ORDER BY o.o_us DESC) AS rn
        |  FROM ev LEFT JOIN o
        |    ON o.o_custkey = ev.user_id AND o.o_us <= ev.us)
        |SELECT user_id, count(*) AS n_events,
        |  count(o_orderkey) AS n_matched,
        |  count(CASE WHEN us - o_us <= 2592000000000 THEN 1 END) AS n_recent
        |FROM j WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("q283_asof_rule_pushdown", q283, Some(
      """WITH ev AS (SELECT event_id, user_id, ts FROM events
        |    WHERE user_id % 10 = 3),
        |o AS (SELECT o_custkey, o_orderdate FROM orders),
        |j AS (SELECT ev.event_id, ev.ts, o.o_orderdate,
        |    row_number() OVER (PARTITION BY ev.event_id
        |      ORDER BY o.o_orderdate DESC) AS rn
        |  FROM ev LEFT JOIN o ON o.o_custkey = ev.user_id
        |    AND o.o_orderdate <= ev.ts)
        |SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
        |  count(*) AS n_events,
        |  count(o_orderdate) AS n_matched,
        |  count(CASE WHEN epoch_us(ts) - epoch_us(o_orderdate)
        |    <= 2592000000000 THEN 1 END) AS n_recent
        |FROM j WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("q282_asof_native_forward", q282, Some(
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |o AS (SELECT o_custkey, epoch_us(o_orderdate) AS o_us,
        |    min(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2),
        |j AS (SELECT ev.event_id, ev.user_id, ev.us, o.o_us, o.o_orderkey,
        |    row_number() OVER (PARTITION BY ev.event_id
        |      ORDER BY o.o_us) AS rn
        |  FROM ev LEFT JOIN o ON o.o_custkey = ev.user_id
        |    AND o.o_us >= ev.us AND o.o_us <= ev.us + 604800000000)
        |SELECT event_id, user_id,
        |  coalesce(o_orderkey, -1) AS next_orderkey,
        |  coalesce(o_us - us, -1) AS wait_us
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin)),
    Q("q249_asof_tolerance", q249, Some(
      """WITH o AS (SELECT o_custkey AS user_id,
        |    epoch_us(o_orderdate) AS o_us, o_orderkey FROM orders),
        |f AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        |j AS (SELECT f.event_id, o.o_us, o.o_orderkey, f.us,
        |    row_number() OVER (PARTITION BY f.event_id
        |      ORDER BY o.o_us, o.o_orderkey) AS rn
        |  FROM f JOIN o ON f.user_id = o.user_id
        |    AND o.o_us >= f.us AND o.o_us <= f.us + 604800000000)
        |SELECT f.event_id, f.user_id,
        |  coalesce(j.o_orderkey, -1) AS next_orderkey,
        |  coalesce(j.o_us - j.us, -1) AS wait_us
        |FROM f LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
        |  ON f.event_id = j.event_id
        |ORDER BY f.event_id""".stripMargin)),
    Q("q245_twap", q245, Some(
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |d AS (SELECT event_type, day, v,
        |    coalesce(lead(us) OVER (PARTITION BY event_type, day
        |        ORDER BY us, event_id),
        |      (day + 1) * 86400000000) - us AS dwell
        |  FROM e)
        |SELECT event_type, day, count(*) AS n_ticks,
        |  round(CAST(sum(v * dwell) AS DOUBLE) / sum(dwell), 6) AS twap,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS naive_avg
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("q246_markov_transitions", q246, Some(
      """WITH t AS (SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next
        |  FROM events),
        |c AS (SELECT cur, next, count(*) AS n FROM t
        |  WHERE next IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, next, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
        |FROM c ORDER BY cur, next""".stripMargin)),
    Q("q232_pit_join", q232, Some(
      """WITH d AS (SELECT o_custkey AS user_id,
        |    epoch_us(o_orderdate) AS vf, o_orderkey AS ok,
        |    round(o_totalprice, 2) AS tier_price,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS n_orders
        |  FROM orders),
        |d2 AS (SELECT *, lead(vf) OVER (PARTITION BY user_id
        |    ORDER BY vf, ok) AS vt FROM d),
        |f AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
        |SELECT f.event_id, f.user_id, d2.n_orders, d2.tier_price,
        |  d2.n_orders IS NOT NULL AS has_dim
        |FROM f LEFT JOIN d2 ON f.user_id = d2.user_id
        |  AND d2.vf <= f.us AND (d2.vt IS NULL OR f.us < d2.vt)
        |ORDER BY event_id""".stripMargin)),
    Q("q234_stickiness", q234, Some(
      """WITH ud AS (SELECT DISTINCT
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id
        |  FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |wau AS (SELECT w.day, count(*) AS wau FROM (
        |    SELECT DISTINCT ud.day + g.i AS day, user_id
        |    FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS i) g) w
        |  GROUP BY 1)
        |SELECT dau.day, dau, wau,
        |  round(dau / CAST(wau AS DOUBLE), 6) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day, b
        |WHERE dau.day >= b.d0 + 6 AND dau.day <= b.d1
        |ORDER BY 1""".stripMargin)),
    Q("q228_rolling_anomaly", q228, Some(
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day_num,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *, list(n) OVER (PARTITION BY event_type ORDER BY day_num
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS arr FROM d),
        |m AS (SELECT event_type,
        |    strftime(make_timestamp(day_num * 86400000000), '%Y-%m-%d') AS day,
        |    n, list_sort(arr)[4] AS med, arr
        |  FROM w WHERE len(arr) = 7),
        |x AS (SELECT event_type, day, n, med,
        |    list_sort(list_transform(arr, v -> abs(v - med)))[4] AS mad
        |  FROM m)
        |SELECT event_type, day, n, med, mad,
        |  CASE WHEN mad > 0
        |       THEN round((n - med) / (1.4826 * mad), 6) END AS robust_z,
        |  CASE WHEN mad = 0 THEN n <> med
        |       ELSE abs((n - med) / (1.4826 * mad)) > 3.5 END AS anomaly
        |FROM x ORDER BY event_type, day""".stripMargin)),
    Q("q224_ohlc_bars", q224, Some(
      """WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    epoch_us(ts) AS us, event_id, value FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY us, event_id) AS rf,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY us DESC, event_id DESC) AS rl
        |  FROM e)
        |SELECT event_type, day,
        |  max(CASE WHEN rf = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rl = 1 THEN value END) AS close,
        |  count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_value
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("q205_attribution", q205, Some(
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        |  FROM events WHERE user_id % 2 = 0),
        |p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS c_id, us AS c_us FROM e
        |      WHERE event_type = 'click'),
        |j AS (SELECT p.p_id, c.c_id,
        |    row_number() OVER (PARTITION BY p.p_id
        |      ORDER BY c.c_us, c.c_id) AS rn,
        |    count(*) OVER (PARTITION BY p.p_id) AS n
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.c_us >= p.p_us - 432000000000 AND c.c_us <= p.p_us)
        |SELECT p_id, c_id,
        |  round(CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
        |             WHEN rn = 1 OR rn = n THEN 0.4
        |             ELSE 0.2 / (n - 2) END, 6) AS credit
        |FROM j ORDER BY p_id, c_id""".stripMargin)),
    Q("q194_scd2_history", q194, Some(
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |v AS (SELECT user_id, event_type, us,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |  FROM e),
        |r AS (SELECT user_id, version, any_value(event_type) AS event_type,
        |    min(us) AS valid_from, count(*) AS n_events
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, event_type, valid_from,
        |  coalesce(lead(valid_from) OVER
        |    (PARTITION BY user_id ORDER BY valid_from), -1) AS valid_to,
        |  n_events,
        |  (coalesce(lead(valid_from) OVER
        |    (PARTITION BY user_id ORDER BY valid_from), -1) = -1) AS is_current
        |FROM r ORDER BY user_id, version""".stripMargin)),
    Q("q169_basket_lift", q169, Some(
      """WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
        |             event_type FROM events),
        |nb AS (SELECT count(*) AS nb FROM
        |         (SELECT DISTINCT user_id, d FROM b)),
        |tc AS (SELECT event_type AS t, count(*) AS n_t FROM b GROUP BY 1),
        |p AS (SELECT x.event_type AS ta, y.event_type AS tb,
        |        count(*) AS n_ab
        |      FROM b x JOIN b y ON x.user_id = y.user_id AND x.d = y.d
        |        AND x.event_type < y.event_type
        |      GROUP BY 1, 2)
        |SELECT ta, tb, n_ab, a.n_t AS n_a, c.n_t AS n_b,
        |  round(n_ab * nb.nb / CAST(a.n_t * c.n_t AS DOUBLE), 6) AS lift
        |FROM p JOIN tc a ON a.t = ta JOIN tc c ON c.t = tb, nb
        |ORDER BY ta, tb""".stripMargin)),
    Q("q159_locf_fill", q159, Some(
      """WITH o AS (SELECT o_orderpriority AS prio,
        |             CAST(o_orderdate AS DATE) AS d, o_totalprice
        |           FROM orders),
        |daily AS (SELECT prio, d, max(o_totalprice) AS v
        |          FROM o GROUP BY 1, 2),
        |spine AS (SELECT prio, CAST(unnest(generate_series(
        |            CAST(min_d AS TIMESTAMP), CAST(max_d AS TIMESTAMP),
        |            INTERVAL 1 DAY)) AS DATE) AS d
        |          FROM (SELECT prio, min(d) AS min_d, max(d) AS max_d
        |                FROM o GROUP BY 1)),
        |j AS (SELECT spine.prio AS prio, spine.d AS d, v
        |      FROM spine LEFT JOIN daily
        |        ON spine.prio = daily.prio AND spine.d = daily.d)
        |SELECT prio, strftime(d, '%Y-%m-%d') AS day,
        |  coalesce(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY prio ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
        |    AS filled,
        |  v IS NOT NULL AS observed
        |FROM j ORDER BY 1, 2""".stripMargin)),
    Q("q154_concurrency_sweep", q154, Some(
      """WITH o AS (SELECT o_orderpriority AS prio,
        |             CAST(o_orderdate AS DATE) AS start_d,
        |             CAST(o_orderdate AS DATE) +
        |               CAST(1 + o_orderkey % 5 AS INT) * INTERVAL 1 DAY
        |               AS end_d
        |           FROM orders),
        |del AS (SELECT prio, d, CAST(sum(delta) AS BIGINT) AS net FROM (
        |          SELECT prio, start_d AS d, 1 AS delta FROM o
        |          UNION ALL
        |          SELECT prio, CAST(end_d AS DATE), -1 FROM o)
        |        GROUP BY 1, 2)
        |SELECT prio, strftime(d, '%Y-%m-%d') AS day, net,
        |  CAST(sum(net) OVER (PARTITION BY prio ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS active
        |FROM del ORDER BY prio, day""".stripMargin)),
    Q("q156_date_spine", q156, Some(
      """WITH o AS (SELECT o_orderpriority AS prio,
        |             CAST(o_orderdate AS DATE) AS d FROM orders),
        |daily AS (SELECT prio, d, count(*) AS n FROM o GROUP BY 1, 2),
        |spine AS (SELECT prio, CAST(unnest(generate_series(
        |            CAST(min_d AS TIMESTAMP), CAST(max_d AS TIMESTAMP),
        |            INTERVAL 1 DAY)) AS DATE) AS d
        |          FROM (SELECT prio, min(d) AS min_d, max(d) AS max_d
        |                FROM o GROUP BY 1))
        |SELECT spine.prio, strftime(spine.d, '%Y-%m-%d') AS day,
        |  coalesce(n, 0) AS n_orders
        |FROM spine LEFT JOIN daily
        |  ON spine.prio = daily.prio AND spine.d = daily.d
        |ORDER BY 1, 2""".stripMargin)),
    Q("q143_streaks", q143, Some(
      """WITH m AS (SELECT DISTINCT user_id,
        |             datediff('day', DATE '2024-01-01',
        |                      date_trunc('day', ts)) AS dn
        |           FROM events WHERE value > 190),
        |g AS (SELECT user_id, dn,
        |        dn - dense_rank() OVER (PARTITION BY user_id ORDER BY dn)
        |          AS grp
        |      FROM m),
        |st AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_streaks,
        |  max(len) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin)),
    Q("q140_cohort_retention", q140, Some(
      """WITH ev AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        |            FROM events WHERE value > 190),
        |c AS (SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY 1)
        |SELECT strftime(c.cohort_d, '%Y-%m-%d') AS cohort,
        |  CAST(datediff('day', c.cohort_d, ev.d) AS BIGINT) AS days_since,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("q165_funnel_deadline", q165, Some(
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |c AS (SELECT user_id, min(us) AS c_us FROM e
        |      WHERE event_type = 'click' GROUP BY 1),
        |v AS (SELECT e.user_id AS user_id, min(us) AS v_us
        |      FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'view'
        |        AND us > c_us AND us <= c_us + 604800000000
        |      GROUP BY 1),
        |p AS (SELECT e.user_id AS user_id, min(us) AS p_us
        |      FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'purchase'
        |        AND us > v_us AND us <= v_us + 604800000000
        |      GROUP BY 1)
        |SELECT c.user_id, CASE WHEN p_us IS NOT NULL THEN 'converted'
        |    WHEN v_us IS NOT NULL THEN 'viewed'
        |    ELSE 'clicked' END AS stage,
        |  c_us, v_us, p_us, p_us - c_us AS convert_us
        |FROM c LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin)),
    // q183's oracle runs the REAL regex over each (user, day) path:
    // lazy groups in ^(.*?)c(.*?)v(.*?)p reproduce leftmost-first
    // matching with backtracking, and the group lengths index the match
    // back into the ordered timestamp list (1-based list indexing).
    Q("q183_backtracking_match", q183, Some(
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    epoch_us(ts) AS us, event_id,
        |    CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
        |      WHEN 'purchase' THEN 'p' ELSE 'x' END AS t
        |  FROM events),
        |paths AS (SELECT user_id, d,
        |    string_agg(t, '' ORDER BY us, event_id) AS path,
        |    list(us ORDER BY us, event_id) AS uss
        |  FROM e GROUP BY 1, 2),
        |m AS (SELECT user_id, d, uss,
        |    length(regexp_extract(path, '^(.*?)c(.*?)v(.*?)p', 1)) AS a,
        |    length(regexp_extract(path, '^(.*?)c(.*?)v(.*?)p', 2)) AS b,
        |    length(regexp_extract(path, '^(.*?)c(.*?)v(.*?)p', 3)) AS g
        |  FROM paths WHERE regexp_matches(path, 'c.*v.*p'))
        |SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
        |  uss[a + 1] AS c_us, uss[a + b + 2] AS v_us,
        |  uss[a + b + g + 3] AS p_us
        |FROM m ORDER BY user_id, day""".stripMargin)),
    Q("q130_funnel_pattern", q130, Some(
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string(
        |      (list(event_type ORDER BY epoch_us(ts), event_id))[1:8], ',')
        |      AS path
        |  FROM events GROUP BY user_id),
        |s AS (SELECT user_id,
        |        CASE WHEN regexp_matches(path, 'click.*view.*purchase')
        |               THEN 'full_funnel'
        |             WHEN regexp_matches(path, 'click.*view') THEN 'click_view'
        |             WHEN regexp_matches(path, 'click') THEN 'click_only'
        |             ELSE 'no_click' END AS stage
        |      FROM p)
        |SELECT stage, count(*) AS n_users FROM s
        |GROUP BY stage ORDER BY stage""".stripMargin)),
    Q("q122_decayed_features", q122, Some {
      val coefSql = decayCoefs.map(_.toPlainString).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
         |           FROM events),
         |w AS (SELECT user_id, event_id,
         |        list(value) OVER (PARTITION BY user_id ORDER BY us, event_id
         |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vs
         |      FROM e)
         |SELECT user_id, event_id, CAST(len(vs) AS BIGINT) AS n_window,
         |  round(list_sum([vs[i] * ($coefSql)[len(vs) - i + 1]
         |                  FOR i IN generate_series(1, len(vs))]), 6) AS decayed
         |FROM w ORDER BY user_id, event_id""".stripMargin
    }),
    Q("q35_asof_join", q35, Some(
      """SELECT event_id, user_id, asof_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= epoch_us(ts)
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin)),
    Q("q36_range_join_neighbors", q36, Some(
      """SELECT a.event_id, count(b.event_id) AS n_neighbors
        |FROM events a
        |LEFT JOIN events b ON b.user_id = a.user_id
        |  AND b.event_id != a.event_id
        |  AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 3600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("q37_sessionize", q37, Some(
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1
        |         WHEN lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, event_id, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |  FROM t
        |)
        |SELECT user_id, session_no, count(*) AS n_events, min(us) AS start_us,
        |  max(us) - min(us) AS dur_us
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
  )
}
