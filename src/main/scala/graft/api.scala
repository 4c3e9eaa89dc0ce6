package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle.
  *
  * `fn(spark, sfDir)` must return a deterministic DataFrame (stable row
  * order, rounded doubles) whose column names match the oracle's aliases
  * exactly — the driver's compare sorts columns by name before hashing.
  * `oracle` is ANSI-ish SQL runnable by DuckDB against the same parquet
  * tables (registered under their bare table names). `None` means the
  * driver falls back to a rows-only check (used for probabilistic or
  * non-SQL-expressible operators).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A themed group of queries; SparkEntry concatenates all packs. */
trait QueryPack {
  def queries: Seq[Q]
}

/** Registry of PROCESS-PINNED localCheckpoint blocks.
  *
  * Query packs may cache an eagerly-checkpointed frame per source dir
  * (e.g. Dedup's shingle frame, which five gates share): a truncated
  * lineage can't be recomputed, so unpersisting its blocks would make
  * every later reuse fail with missing-block errors. Bench/Verify's
  * between-query hygiene (unpersist leaked per-query checkpoints so late
  * queries aren't taxed by earlier ones' memory) therefore exempts ids
  * registered here — and ONLY these: per-call checkpoints (q115's edge
  * frames, q165's stage pins) still get reclaimed. Pinned footprint is
  * bounded by design: one small frame per (pack, source dir).
  */
object PinnedBlocks {
  private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Eagerly localCheckpoint `df` and pin the resulting blocks.
    *
    * The checkpointed frame's plan is a `LogicalRDD` wrapping exactly the
    * persisted internal RDD, so we pin THAT id — not a before/after diff
    * of all persistent RDDs, which would permanently pin any concurrent
    * thread's ordinary cache()/localCheckpoint() that lands in the
    * window (and clearUnpinned would then never reclaim it). */
  def pinnedCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => ids.add(lr.rdd.id)
      case _ =>
    }
    ck
  }

  def isPinned(id: Int): Boolean = ids.contains(id)

  /** Unpin a previously pinned checkpoint frame and release its blocks —
    * the counterpart of [[pinnedCheckpoint]] for cache-replacement paths
    * (a stale entry bound to a stopped session would otherwise leave its
    * ids pinned forever, invisible to [[clearUnpinned]]). Safe on a dead
    * SparkContext: unpersist is best-effort, the id removal is what
    * matters. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ids.remove(lr.rdd.id)
        // NonFatal only: a dead-context unpersist throwing is fine to
        // ignore, but an OOM/interrupt must keep propagating
        try lr.rdd.unpersist(false)
        catch { case scala.util.control.NonFatal(_) => () }
      case _ =>
    }

  /** Unpersist every non-pinned persistent RDD — the shared
    * between-query hygiene for Bench and Verify. */
  def clearUnpinned(s: SparkSession): Unit =
    s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!ids.contains(id)) rdd.unpersist(false)
    }
}
