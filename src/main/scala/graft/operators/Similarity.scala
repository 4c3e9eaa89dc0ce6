package graft.operators

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (north-star extension):
  * brute-force cosine top-k as the exactness baseline, a deterministic
  * IVF (inverted-file) variant as the oracle-checkable scale path, and a
  * random-hyperplane LSH variant as the probabilistic scale path.
  *
  * Scale design (100 TB):
  *   - Brute force: query set broadcast, corpus scanned once; per-query
  *     top-k via window rank. For large query sets switch the window to a
  *     per-partition heap (mapPartitions top-k + final merge) — the
  *     ranking semantics stay identical.
  *   - IVF: corpus is partitioned into cells (nearest centroid); a query
  *     probes only its `nprobe` nearest cells — the candidate set shrinks
  *     by ~|cells|/nprobe. Centroids here are a deterministic subset (a
  *     k-means fit is an offline job upstream); assignment and probing are
  *     pure DataFrame joins, so the whole index is rebuildable per batch.
  *   - LSH: L hash tables × b sign-bits of random hyperplane projections;
  *     candidates share a bucket in ≥1 table. Tunable recall/cost via
  *     (L, b); verified-subset semantics like the dedup suite.
  */
object Similarity extends QueryPack {

  /** Codegen'd dot product (graft.functions.DotProduct) by column name. */
  private def dotc(s: SparkSession, a: String, b: String): Column =
    graft.functions.VectorFunctions.dot(s, a, b)

  /** cosine over columns with precomputed norms, rounded to 6. */
  private def cos6(s: SparkSession, a: String, b: String,
      na: String, nb: String): Column =
    round(dotc(s, a, b) / (col(na) * col(nb)), 6)

  /** Corpus with per-vector norm computed once (never per pair). */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(s, "v", "v")))

  /** q46: exact brute-force cosine top-5 for query vectors (vec_id<10).
    * Also the recall yardstick for the q48/q103 self-verifying gates. */
  private[operators] def q46(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
    val q = e.filter(col("vec_id") < 10).toDF("query_id", "qv", "qnrm")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(e.toDF("neighbor_id", "v", "nrm"), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cos6(s, "qv", "v", "qnrm", "nrm"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** q47: IVF top-5 — 16 deterministic centroids (vec_id<16), nprobe=4.
    * Fully deterministic ⇒ exact DuckDB oracle. */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
    val cents = e.filter(col("vec_id") < 16).toDF("cid", "cv", "cnrm")
    // cell assignment: nearest centroid by cosine (deterministic ties)
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid"))
    val assign = e.crossJoin(broadcast(cents))
      .withColumn("ccos", cos6(s, "v", "cv", "nrm", "cnrm"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select("vec_id", "v", "nrm", "cid")
    val q = e.filter(col("vec_id") < 10).toDF("query_id", "qv", "qnrm")
    // probe the 4 nearest cells per query
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("pcos", cos6(s, "qv", "cv", "qnrm", "cnrm"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 4)
      .select("query_id", "qv", "qnrm", "cid")
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(assign.toDF("neighbor_id", "v", "nrm", "cid"), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cos6(s, "qv", "v", "qnrm", "nrm"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Random hyperplanes for LSH: fixed seed, L tables × b bits. */
  private[operators] val LshTables = 16
  private[operators] val LshBits = 6
  private[operators] lazy val hyperplanes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(LshTables, LshBits)(Array.fill(64)(rnd.nextGaussian()))
  }

  /** Hyperplane-LSH ANN top-5 — the probabilistic scale path. Candidate
    * generation is bucketed (L tables × b sign-bits); ranking among
    * candidates is exact cosine. This is the user-facing result frame;
    * the gated q48 wraps it in a self-verifying recall check. */
  private[operators] def lshTop5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planes = hyperplanes
    val e = corpus(s, dir)
    // Buckets carry ONLY ids — the 64-dim vectors would otherwise ride
    // through the bucket join and the candidate-dedup shuffle 16× (once
    // per table). Vectors are re-joined once per distinct candidate pair.
    // Typed flatMap rather than UDF+posexplode: Catalyst infers a
    // `size(...) > 0` filter under a Generate and would re-evaluate the
    // UDF (plus the float→double transform, interpreted) once more per
    // row; the typed boundary computes each code exactly once. Codes are
    // hashed from the raw float vector — float→double widening is exact,
    // so the signs (and buckets) are identical to hashing `v`.
    def codesOf(in: DataFrame): DataFrame = in
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        planes.iterator.zipWithIndex.map { case (table, tableId) =>
          var code = 0L
          var bit = 0
          while (bit < table.length) {
            val plane = table(bit)
            var d = 0.0
            var i = 0
            while (i < plane.length && i < emb.length) {
              d += plane(i) * emb(i); i += 1
            }
            if (d >= 0) code |= (1L << bit)
            bit += 1
          }
          (id, tableId, code)
        } }
      .toDF("vec_id", "table_id", "bucket")
    val buckets = codesOf(Tables.embeddings(s, dir))
    // query-side codes from the 10-row filtered scan (pushdown reaches
    // parquet), not by re-hashing the whole corpus a second time; the
    // 160-row result broadcasts, so the bucket join is map-side
    val qb = broadcast(
      codesOf(Tables.embeddings(s, dir).filter(col("vec_id") < 10))
        .toDF("query_id", "table_id", "bucket"))
    val candIds = qb.join(buckets.toDF("neighbor_id", "table_id", "bucket"),
        Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val cand = candIds
      .join(e.toDF("query_id", "qv", "qnrm"), "query_id")
      .join(e.toDF("neighbor_id", "v", "nrm"), "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", cos6(s, "qv", "v", "qnrm", "nrm"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Pooled recall@5 floor for the q48 gate. Measured recall of the
    * (seeded, deterministic) 16×6 hyperplane family on this corpus is
    * 0.62–0.70 at sf0.001/0.01/0.1; 0.55 sits just under the measured
    * band, so a silent degradation of the bucketing (not only a full
    * collapse) fails the gate while normal cross-sf variation passes.
    * Same floor as ExtensionSpecs' per-pair pin. */
  private[operators] val LshRecallFloor = 0.55

  /** q48: hyperplane-LSH ANN — SELF-VERIFYING gate. LSH output is
    * probabilistic (no exact SQL oracle can reproduce which neighbors
    * the buckets surface), so the gated frame is the verification
    * itself: join [[lshTop5]] against the exact top-5 (q46's semantics,
    * which DuckDB CAN compute) and emit pooled recall ≥ floor as a
    * checked column. The oracle pins n_queries/n_exact from the data and
    * `recall_ok = true` — a recall collapse now hash-FAILS the driver
    * gate instead of hiding in a rows-only row. Per-pair recall detail
    * stays pinned in ExtensionSpecs. */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val lsh = lshTop5(s, dir).select(col("query_id"), col("neighbor_id"))
      .withColumn("found", lit(1L))
    val exact = q46(s, dir).select("query_id", "neighbor_id")
    exact.join(lsh, Seq("query_id", "neighbor_id"), "left")
      .agg(
        countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("found"), lit(0L))).as("hits"))
      .select(col("n_queries"), col("n_exact"),
        lit(LshRecallFloor).as("recall_floor"),
        (col("hits").cast("double") / col("n_exact") >= LshRecallFloor)
          .as("recall_ok"))
  }

  /** Product-quantization geometry: 64 dims → 8 sub-vectors of 8 dims,
    * 16 codes per subspace. Codebook = the sub-vectors of vec_id < 16
    * (deterministic, like q47's centroids — a trained codebook is an
    * offline job upstream; the index mechanics are what's under test). */
  private val PqSub = 8
  private val PqDim = 8

  /** Squared L2 between two 8-dim array columns via the codegen'd
    * [[graft.functions.SquaredL2]] expression (sequential left-to-right
    * adds — bit-identical to the oracle's ordered list_sum), rounded to
    * 6 so argmin tie-breaks (by code id) land identically on both
    * engines. A native expression rather than an `aggregate` HOF: the
    * HOF evaluates interpreted and would break the index build's
    * whole-stage codegen. */
  private def d2r6(s: SparkSession, a: String, b: String): Column =
    round(graft.functions.VectorFunctions.squaredL2(s, a, b), 6)

  /** ADC shortlist size for q113: the exact-rerank candidate budget per
    * query. 100-of-corpus keeps pooled recall@5 ≈ 0.9 at sf0.01 (0.72 at
    * 50, 0.46 at 20 — CurationOpsSpec pins the floor); at production
    * scale this is the usual fixed shortlist the rerank stage can afford
    * to read full vectors for. */
  private val PqShortlist = 100

  /** q113: product-quantization ANN (ADC — asymmetric distance — plus
    * exact rerank). The missing quarter of the ANN suite: q46 exact /
    * q47 IVF (prune candidates) / q48 LSH (probabilistic) / q113 PQ
    * (compress the corpus). Index build: each vector's 8 sub-vectors are
    * quantized to the nearest codebook entry — the 64-dim float vector
    * becomes 8 small codes (512 bytes → 8 at production bit-widths).
    * Search: a query precomputes a 16×8 lookup table of sub-distances,
    * scores every candidate with 8 LUT adds (no vector arithmetic
    * against the corpus), keeps the [[PqShortlist]] best, and reranks
    * ONLY those with exact cosine — the standard two-stage ADC+rerank
    * deployment, where the full vectors are read for 100 candidates
    * instead of the whole corpus.
    *
    * Scale shape (100 TB): code assignment is one corpus pass against a
    * broadcast 128-row codebook with a map-side-combinable argmin
    * (`min(struct(d2, c))` — no window sort); the scan phase joins codes
    * to a broadcast 1,280-row LUT, so the corpus never shuffles until
    * the per-query shortlist; the rerank join touches shortlist-sized
    * data only. Everything is equi-join — no cartesian. Fully
    * deterministic ⇒ exact DuckDB oracle. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // (id, j, sv): the j-th 8-dim sub-vector of every vector
    def subVecs(in: DataFrame): DataFrame = in
      .select(col("vec_id"), col("v"),
        explode(sequence(lit(0), lit(PqSub - 1))).as("j"))
      .select(col("vec_id"), col("j"),
        expr(s"slice(v, j * $PqDim + 1, $PqDim)").as("sv"))
    val cb = subVecs(e.filter(col("vec_id") < 16))
      .select(col("vec_id").as("c"), col("j"), col("sv").as("cv"))
    // index build: nearest code per (vector, subspace); the aggregate
    // argmin combines map-side, unlike a row_number window. (r18 note: a
    // defaultParallelism spread before the build was A/B'd and REVERTED —
    // the 0.26 s single-task assignment pass shrank to a 0.15 s stage but
    // the extra exchange + AQE stage cost more than it saved; at scale
    // the scan splits naturally and no spread is needed.)
    val codes = subVecs(e)
      .join(broadcast(cb), Seq("j"))
      .withColumn("d2", d2r6(s, "sv", "cv"))
      .groupBy("vec_id", "j")
      .agg(min(struct(col("d2"), col("c"))).as("m"))
      .select(col("vec_id"), col("j"), col("m.c").as("code"))
    // query LUT: distance from each query sub-vector to every code
    val lut = subVecs(e.filter(col("vec_id") < 10))
      .select(col("vec_id").as("query_id"), col("j"), col("sv"))
      .join(broadcast(cb), Seq("j"))
      .withColumn("d2", d2r6(s, "sv", "cv"))
      .select("query_id", "j", "c", "d2")
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("adc"), col("neighbor_id"))
    val shortlist = codes
      .join(broadcast(lut), codes("j") === lut("j") && codes("code") === lut("c"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(round(sum("d2"), 6).as("adc"))
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= PqShortlist)
      .select("query_id", "neighbor_id", "adc")
    // exact rerank over the shortlist only: full vectors are fetched for
    // |queries| × shortlist rows, never the whole corpus
    val withNorm = corpus(s, dir)
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(shortlist)
      .join(withNorm.toDF("neighbor_id", "v", "nrm"), "neighbor_id")
      .join(withNorm.toDF("query_id", "qv", "qnrm"), "query_id")
      .withColumn("cos", cos6(s, "qv", "v", "qnrm", "nrm"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos", "adc")
      .orderBy("query_id", "rank")
  }

  /** q219: hybrid retrieval — reciprocal-rank fusion (RRF, k = 60;
    * Cormack et al., SIGIR 2009) of a LEXICAL ranking (BM25, q210's
    * scorer) and a DENSE ranking (cosine against vec 0's embedding): the
    * standard two-tower RAG retrieval stack, where neither signal alone
    * recalls what the fused list does. Candidates exclude doc 0 (the
    * query document itself — a more-like-this search).
    *
    * Scale shape (100 TB): each leg cuts to its top-[[RrfTopN]] via
    * `orderBy.limit` (TakeOrderedAndProject — per-partition heaps then
    * one merge, never a global window sort over the corpus); the
    * row_number windows that materialize ranks run on those 50-row
    * frames only. The fusion join is list×list (≤ 2·topN rows). BM25's
    * work is bounded by the query terms' postings (q210), the dense
    * leg's by one corpus scan against a 1-row broadcast query.
    *
    * Determinism: both legs rank by ROUNDED score with doc_id tiebreak
    * (the q210/q46 discipline), so each cut is engine-neutral; RRF
    * contributions 1/(60+rank) are doubles computed from identical
    * integer ranks, and the two-term sum is order-insensitive (binary fp
    * addition of two operands commutes exactly). */
  private def q219(s: SparkSession, dir: String): DataFrame = {
    val lexTop = TextAnalysis.bm25Scores(s, dir, Seq("hash", "join", "scan"))
      .filter(col("doc_id") =!= 0)
      .orderBy(col("bm25").desc, col("doc_id")).limit(RrfTopN)
    val lex = lexTop
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    val e = corpus(s, dir)
    val q = e.filter(col("vec_id") === 0).toDF("query_id", "qv", "qnrm")
    val denseTop = e.filter(col("vec_id") =!= 0).toDF("doc_id", "v", "nrm")
      .crossJoin(broadcast(q))
      .withColumn("cos", cos6(s, "qv", "v", "qnrm", "nrm"))
      .orderBy(col("cos").desc, col("doc_id")).limit(RrfTopN)
    val dense = denseTop
      .withColumn("vec_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))))
      .select(col("doc_id"), col("vec_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)),
          12).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(15)
  }
  private val RrfK = 60
  private val RrfTopN = 50

  private val cosSql =
    "round(list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s))), 6)"
  private def cs(a: String, b: String) = cosSql.format(a, b, a, a, b, b)

  /** q235: scalar INT8 quantization (SQ8) of the embedding corpus — the
    * standard 4× memory compression applied before an ANN index is
    * built (PQ q113 is the coarser 32×; SQ8 is the near-lossless tier):
    * per vector, scale = max|x|/127, code_i = round(x_i/scale) ∈
    * [−127, 127]. Map-only over the corpus — no shuffle at all except
    * the output sort — so it scales embarrassingly; all lambdas are
    * codegen'd higher-order array functions, never a UDF.
    *
    * Engine-neutral determinism: both sides compute the IDENTICAL double
    * expression floor(x·127/amax + 0.5) (round-half-up, not the
    * half-even `round()` whose tie behavior differs per engine), and the
    * reconstruction error re-derives the code inline so the compared
    * doubles come from the same IEEE op sequence. Rounded once at the
    * edge (scale 9 dp, err 6 dp). */
  private def q235(s: SparkSession, dir: String): DataFrame = {
    val code: Column => Column => Column =
      amax => x => floor(x * lit(127.0) / amax + lit(0.5))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
      .filter(col("amax") > 0)
      .withColumn("q", transform(col("v"), code(col("amax"))))
    e.select(col("vec_id"), size(col("v")).as("n_dims"),
        round(col("amax") / 127.0, 9).as("sq_scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("code_sum"),
        array_min(col("q")).as("code_min"),
        array_max(col("q")).as("code_max"),
        round(array_max(transform(col("v"),
          x => abs(x - code(col("amax"))(x) * (col("amax") / lit(127.0))))),
          6).as("recon_err"))
      .orderBy("vec_id")
  }

  /** One upper-triangular cell of the corpus Gram matrix (1-based dims). */
  case class GramCell(i: Int, j: Int, s: Long)

  /** One-pass GRAM/COVARIANCE accumulator over the embedding corpus —
    * the statistic PCA-whitening, decorrelation checks, and linear-probe
    * feature analysis all start from: G[i][j] = Σ_docs e_i·e_j.
    *
    * Scale design: the naive formulation explodes every vector to its
    * d(d+1)/2 = 2 080 (i, j, e_i·e_j) terms and groups by (i, j) —
    * N·d²/2 shuffled rows. This typed Aggregator instead carries ONE
    * fixed d(d+1)/2-cell buffer per task: reduce folds each vector into
    * the local buffer (map-side combine), merge adds buffers
    * elementwise, and the exchange moves O(d²) longs per map partition
    * total — at 100 TB the shuffle is measured in kilobytes per task
    * regardless of N. Compute is the irreducible N·d²/2 multiply-adds,
    * running at scan speed with no intermediate row blow-up.
    *
    * Engine-neutral exactness: each float is mapped to a scaled integer
    * n = floor(x·10⁶) — float→double is exact, the double product
    * x·10⁶ is exact (24-bit mantissa × 5⁶ < 2⁵³), and floor has no
    * tie — so both engines derive the IDENTICAL integers and the cell
    * sums are exact 64-bit arithmetic, hash-equal by construction
    * (the q235 floor-not-round discipline). Overflow headroom: with
    * max|e| ≈ 0.58 each term is < 3.6·10¹¹, so Long holds ~2.5·10⁷
    * rows; a 100 TB corpus promotes the buffer to per-cell DECIMAL(38)
    * (or double + tolerance oracle) — the aggregation shape is
    * unchanged. Fixture dims are 64 across all scale factors. */
  object GramAgg extends Aggregator[Seq[Float], Array[Long], Seq[GramCell]] {
    private val D = 64
    override def zero: Array[Long] = new Array[Long](D * (D + 1) / 2)
    override def reduce(b: Array[Long], e: Seq[Float]): Array[Long] = {
      // loud invariant: a regenerated fixture with a different dim must
      // fail with a message, not truncate (wrong-but-green vs oracle,
      // which truncates identically) or throw an opaque OOB in a task
      require(e.length == D,
        s"GramAgg expects $D-dim embeddings, got ${e.length}")
      val n = new Array[Long](D)
      var i = 0
      while (i < D) {
        n(i) = math.floor(e(i).toDouble * 1e6).toLong
        i += 1
      }
      var k = 0
      i = 0
      while (i < D) {
        var j = i
        while (j < D) { b(k) += n(i) * n(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var k = 0
      while (k < x.length) { x(k) += y(k); k += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[GramCell] = {
      val out = Seq.newBuilder[GramCell]
      var k = 0
      var i = 0
      while (i < D) {
        var j = i
        while (j < D) { out += GramCell(i + 1, j + 1, b(k)); k += 1; j += 1 }
        i += 1
      }
      out.result()
    }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[GramCell]] = ExpressionEncoder()
  }

  /** q273: corpus Gram matrix in ONE aggregation pass via [[GramAgg]] —
    * a single global agg (partial buffers map-side, one merged row),
    * exploded back to 2 080 (i, j, gram) cells only at the gate edge.
    * The oracle states the same integers via the N·d²/2 explode-and-sum
    * formulation, which is exactly the shuffle blow-up the Aggregator
    * avoids. */
  private def q273(s: SparkSession, dir: String): DataFrame = {
    val gram = udaf(GramAgg, ExpressionEncoder[Seq[Float]]())
    Tables.embeddings(s, dir)
      .agg(gram(col("embedding")).as("g"))
      .select(explode(col("g")).as("c"))
      .select(col("c.i").cast("long").as("i"),
        col("c.j").cast("long").as("j"), col("c.s").as("gram"))
      .orderBy("i", "j")
  }

  override def queries: Seq[Q] = Seq(
    Q("q273_gram_matrix", q273, Some(
      """WITH n AS (SELECT list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
        |  FROM embeddings),
        |ij AS (SELECT s.i, t.j
        |  FROM generate_series(1, 64) s(i), generate_series(1, 64) t(j)
        |  WHERE t.j >= s.i)
        |SELECT i, j, CAST(sum(v[i] * v[j]) AS BIGINT) AS gram
        |FROM n, ij GROUP BY i, j ORDER BY i, j""".stripMargin)),
    Q("q235_sq8_quantize", q235, Some(
      """WITH v AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |a AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS amax
        |  FROM v WHERE list_max(list_transform(v, x -> abs(x))) > 0),
        |c AS (SELECT vec_id, v, amax,
        |    list_transform(v, x -> floor(x * 127.0 / amax + 0.5)) AS q
        |  FROM a)
        |SELECT vec_id, len(v) AS n_dims, round(amax / 127.0, 9) AS sq_scale,
        |  CAST(list_sum(q) AS BIGINT) AS code_sum,
        |  CAST(list_min(q) AS BIGINT) AS code_min,
        |  CAST(list_max(q) AS BIGINT) AS code_max,
        |  round(list_max(list_transform(v, x ->
        |    abs(x - floor(x * 127.0 / amax + 0.5) * (amax / 127.0)))), 6)
        |    AS recon_err
        |FROM c ORDER BY vec_id""".stripMargin)),
    Q("q46_ann_bruteforce", q46, Some(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT query_id, e.vec_id AS neighbor_id, ${cs("qv", "e.v")} AS cos
         |  FROM q JOIN e ON e.vec_id != q.query_id)
         |SELECT query_id, rank, neighbor_id, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),
    Q("q47_ann_ivf", q47, Some(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
         |assign AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT e.vec_id, e.v, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cs("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT q.query_id, q.qv, c.cid,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cs("q.qv", "c.cv")} DESC, c.cid) AS rn
         |    FROM q, c) WHERE rn <= 4),
         |cand AS (
         |  SELECT p.query_id, p.qv, a.vec_id AS neighbor_id, a.v
         |  FROM probes p JOIN assign a ON a.cid = p.cid
         |  WHERE a.vec_id != p.query_id)
         |SELECT query_id, rank, neighbor_id, cos FROM (
         |  SELECT query_id, neighbor_id, ${cs("qv", "v")} AS cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ${cs("qv", "v")} DESC, neighbor_id) AS rank
         |  FROM cand) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),
    // Self-verifying: the oracle pins the corpus-derived counts and the
    // recall bound; Spark's recall_ok column must come out true or the
    // value hash mismatches (see q48 scaladoc).
    Q("q48_ann_lsh", q48, Some(
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(count(*) * 5 AS BIGINT) AS n_exact,
        |  CAST(0.55 AS DOUBLE) AS recall_floor, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin)),
    // The oracle's list_sum comprehension folds sub-distances in index
    // order, matching Spark's sequential `aggregate` fold exactly; both
    // sides round d2 to 6 before the argmin so code ties break by id
    // identically (see q113 scaladoc).
    Q("q113_pq_ann", q113, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sub AS (SELECT vec_id, j, v[(j*8+1):(j*8+8)] AS sv
        |        FROM e, generate_series(0, 7) t(j)),
        |cb AS (SELECT vec_id AS c, j, sv AS cv FROM sub WHERE vec_id < 16),
        |d AS (SELECT s.vec_id, s.j, cb.c,
        |        round(list_sum([ (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i])
        |                         FOR i IN generate_series(1, 8) ]), 6) AS d2
        |      FROM sub s JOIN cb ON cb.j = s.j),
        |codes AS (SELECT vec_id, j, c AS code FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
        |    FROM d) WHERE rn = 1),
        |lut AS (SELECT vec_id AS query_id, j, c, d2 FROM d WHERE vec_id < 10),
        |adc AS (SELECT l.query_id, codes.vec_id AS neighbor_id,
        |          round(sum(l.d2), 6) AS adc
        |        FROM codes JOIN lut l ON l.j = codes.j AND l.c = codes.code
        |        WHERE codes.vec_id != l.query_id
        |        GROUP BY 1, 2),
        |short AS (SELECT query_id, neighbor_id, adc FROM (
        |    SELECT query_id, neighbor_id, adc,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY adc, neighbor_id) AS srank
        |    FROM adc) WHERE srank <= 100),
        |rr AS (SELECT s.query_id, s.neighbor_id,
        |         round(list_dot_product(q.v, n.v) /
        |           (sqrt(list_dot_product(q.v, q.v)) *
        |            sqrt(list_dot_product(n.v, n.v))), 6) AS cos, s.adc
        |       FROM short s
        |       JOIN e q ON q.vec_id = s.query_id
        |       JOIN e n ON n.vec_id = s.neighbor_id)
        |SELECT query_id, rank, neighbor_id, cos, adc FROM (
        |  SELECT query_id, neighbor_id, cos, adc,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM rr) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),
    // q219's legs mirror the q210 BM25 CTE chain and the q46 cosine
    // form; both cut by rounded score + doc_id so rank <= 50 is the
    // same set on both engines.
    Q("q219_hybrid_rrf", q219, Some(
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         |    string_split(text, ' ') AS toks FROM documents),
         |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
         |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
         |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
         |       WHERE term IN ('hash', 'join', 'scan')
         |       GROUP BY 1, 2),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |t AS (SELECT doc_id,
         |    round(ln(1.0 + (n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
         |      (tf * 2.2) /
         |      (tf + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) /
         |        (CAST(sum_dl AS DOUBLE) / n_docs))), 12) AS term_score
         |  FROM tf JOIN dfx USING (term) CROSS JOIN stats),
         |bm AS (SELECT doc_id, round(sum(term_score), 6) AS bm25
         |  FROM t WHERE doc_id != 0 GROUP BY doc_id),
         |lex AS (SELECT doc_id, lex_rank FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
         |      AS lex_rank FROM bm) WHERE lex_rank <= 50),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
         |den AS (SELECT doc_id, vec_rank FROM (
         |    SELECT e.vec_id AS doc_id,
         |      row_number() OVER (ORDER BY ${cs("q", "e.v")} DESC, e.vec_id)
         |        AS vec_rank
         |    FROM e CROSS JOIN qv WHERE e.vec_id != 0) WHERE vec_rank <= 50)
         |SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id, lex_rank, vec_rank,
         |  round(coalesce(1.0 / (60 + lex_rank), 0) +
         |        coalesce(1.0 / (60 + vec_rank), 0), 12) AS rrf
         |FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 15""".stripMargin)),
  )
}
