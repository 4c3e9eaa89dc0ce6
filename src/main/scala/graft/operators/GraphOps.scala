package graft.operators

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational-derived edges (north-star
  * extension). q66 covers reachability (connected components); this pack
  * adds value-propagation iteration — PageRank — the other canonical
  * "loop until done over an edge list" shape a data-curation stack needs
  * (e.g. site-authority weighting of crawled documents before sampling).
  *
  * Scale design (100 TB): the edge list is the big, static side — it is
  * hash-partitioned on `src` and checkpointed ONCE, so every iteration
  * shuffles only the small (|nodes|-sized) rank frame into the edges'
  * existing layout (the q66 trick, Dedup.scala). Per-edge contributions
  * pre-aggregate map-side; iteration count is fixed (power iteration),
  * so lineage stays bounded without per-step checkpoints.
  */
object GraphOps extends QueryPack {

  private val Damping = 0.85
  private val Iters = 3

  /** q115: PageRank (3 power iterations, d = 0.85) on the bipartite
    * supplier → customer graph induced by lineitem ⋈ orders: an edge
    * s → c for every distinct (supplier, customer) trade pair. Node ids
    * are namespaced strings ("s:k" / "c:k") — the two key spaces overlap
    * numerically. Classic formulation without dangling-mass
    * redistribution (customers have no out-edges; their mass exits), so
    * each iteration is exactly: rank' = (1−d)/N + d · Σ_in rank/outdeg.
    *
    * Determinism contract with the oracle: per-edge contributions are
    * rounded to 12 decimals and each iteration's rank to 9, so both
    * engines sum identical multiples of 1e-12 and the sum-order fp
    * wobble (~1e-15) sits far from every rounding boundary — the same
    * fixed-point discipline as the PQ ADC sums (Similarity q113). */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    // distinct edges, pre-partitioned on src and materialized once: the
    // iteration loop below never reshuffles them
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s:"), col("l_suppkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
      .localCheckpoint(true)
    // |V| rides along as a broadcast 1-row aggregate (the q69 corpus-size
    // pattern) — never a driver-side collect
    val n = nodes.agg(count(lit(1)).cast("double").as("n"))
    // degree inherits the edges' src-partitioning (no exchange) and is
    // materialized once, not recomputed per iteration
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to Iters) {
      // ONE materialization per iteration (the q66 discipline): without
      // it the three iterations nest into a single self-referencing
      // plan, and the attribute re-aliasing that dedups the repeated
      // `edges` subtree discards its pre-shuffled partitioning — the
      // checkpointed frame keeps each iteration's plan referencing
      // `edges` exactly once, exchange-free on the big side
      val contribs = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst"), round(col("rank") / col("deg"), 12).as("c"))
        .groupBy("dst")
        .agg(sum("c").as("in_sum"))
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"),
          round(lit(1.0 - Damping) / col("n") +
            lit(Damping) * coalesce(col("in_sum"), lit(0.0)), 9).as("rank"))
        .localCheckpoint(true)
    }
    ranks.orderBy("node")
  }

  /** One oracle iteration: rank' per node from the previous rank CTE. */
  private def iterSql(prev: String, cur: String): String =
    s"""c$cur AS (SELECT e.dst, sum(round(r.rank / d.deg, 12)) AS in_sum
       |       FROM e JOIN $prev r ON r.node = e.src
       |       JOIN deg d ON d.src = e.src GROUP BY 1),
       |$cur AS (SELECT node,
       |         round(0.15::DOUBLE / n.n + 0.85::DOUBLE * coalesce(in_sum, 0.0), 9) AS rank
       |       FROM nodes LEFT JOIN c$cur ON c$cur.dst = node, n)""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q115_pagerank", q115, Some(
      s"""WITH e AS (SELECT DISTINCT 's:' || l_suppkey AS src,
         |             'c:' || o_custkey AS dst
         |           FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |n AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT node, 1.0::DOUBLE / n.n AS rank FROM nodes, n),
         |${iterSql("r0", "r1")},
         |${iterSql("r1", "r2")},
         |${iterSql("r2", "r3")}
         |SELECT node, rank FROM r3 ORDER BY node""".stripMargin)),
  )
}
