package graft.operators

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and sequence-packing operators for training-data
  * pipelines (north-star extension): the steps between "corpus is clean"
  * and "corpus is a training set".
  *
  * All three are deterministic BY CONTENT, not by RNG: splits derive
  * from sha-256 of the row (or its dedup component), packing from a
  * windowed prefix sum — so results are reproducible across engines,
  * re-runs, and cluster sizes, and every query has an exact DuckDB
  * oracle. At 100 TB each is map-only or one hash-partitioned window:
  * no global coordination, no driver state.
  */
object PipelineSplits extends QueryPack {

  /** 80/10/10 by the first two hex chars of a content sha-256:
    * '00'..'cb' (204/256) → train, 'cc'..'e5' (26/256) → val, rest →
    * test. String comparison on lowercase hex is identical in Spark and
    * DuckDB, so the assignment is engine-portable. */
  private def splitOf(h2: org.apache.spark.sql.Column) =
    when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")

  /** q79: deterministic content-hash split — the standard way to carve
    * train/val/test so membership survives recomputation and dataset
    * growth (a doc's split never depends on other rows). Map-only. */
  private def q79(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        splitOf(substring(sha2(col("text"), 256), 1, 2)).as("split"))
      .orderBy("doc_id")

  /** q80: LEAKAGE-SAFE split — near-duplicate documents must land in the
    * same split or eval contaminates train. Split by the sha-256 of the
    * doc's dedup COMPONENT (q66's connected components over verified
    * near-dup pairs; docs without a near-dup are their own singleton
    * component), so every near-dup cluster moves as a unit. */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.components(s, dir)
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("split", splitOf(
        substring(sha2(col("component").cast("string"), 256), 1, 2)))
      .select("doc_id", "component", "split")
      .orderBy("doc_id")
  }

  /** q81: sequence-packing bins — greedy contiguous fill of a 4096-char
    * budget per (lang, source) shard, docs ordered longest-first. The
    * bin id is the EXCLUSIVE prefix sum divided by the budget, i.e. a
    * doc opens a new bin when the previous ones filled it. One windowed
    * prefix sum per shard: the window partitions by (lang, source), so
    * at corpus scale this is a single hash shuffle and per-shard sorts —
    * no global ordering anywhere. */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val budget = 4096L
    val w = Window.partitionBy("lang", "source")
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .withColumn("bin",
        floor((sum(col("n_chars")).over(w) - col("n_chars")) / budget))
      .groupBy("lang", "source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .orderBy("lang", "source", "bin")
  }

  private val splitCaseSql =
    """CASE WHEN %s < 'cc' THEN 'train'
      |     WHEN %s < 'e6' THEN 'val'
      |     ELSE 'test' END""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q79_hash_split", q79, Some(
      s"""SELECT doc_id,
         |  ${splitCaseSql.format(
              "substring(sha256(text), 1, 2)",
              "substring(sha256(text), 1, 2)")} AS split
         |FROM documents ORDER BY doc_id""".stripMargin)),
    Q("q80_leakage_safe_split", q80, Some(
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |          FOR i IN generate_series(1, len(w) - 2)])) AS s FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM p
        |  JOIN sizes na ON na.doc_id = p.id_a
        |  JOIN sizes nb ON nb.doc_id = p.id_b
        |  WHERE round(inter * 1.0 / (na.n + nb.n - inter), 4) >= 0.7),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
        |         FROM reach GROUP BY src)
        |SELECT d.doc_id,
        |  coalesce(c.component, d.doc_id) AS component,
        |  CASE WHEN substring(sha256(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |       WHEN substring(sha256(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin)),
    Q("q81_packing_bins", q81, Some(
      """WITH b AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    CAST(floor((sum(n_chars) OVER (PARTITION BY lang, source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
        |      / 4096) AS BIGINT) AS bin
        |  FROM documents)
        |SELECT lang, source, bin, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
  )
}
