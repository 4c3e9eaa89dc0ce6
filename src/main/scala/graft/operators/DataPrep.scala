package graft.operators

import graft.{Q, QueryPack}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators (north-star extension): the
  * document-to-training-set steps a 100 TB curation pipeline runs after
  * cleaning — chunking, PII redaction, mixture sampling, latest-record
  * compaction, inverted-index construction, cluster centroids, and
  * histogramming.
  *
  * Scale notes per query are on each method; the common theme is that
  * everything is either map-only (chunking, redaction, sampling) or a
  * single hash shuffle on a high-cardinality key (index, centroids), and
  * all randomness is content-hash-derived so results are reproducible on
  * any cluster size and have exact DuckDB oracles.
  */
object DataPrep extends QueryPack {

  /** q88: RAG-style overlapping chunking — fixed window of W=8 tokens
    * with stride S=6 (overlap 2). Map-only fan-out: `sequence` +
    * `explode` + `slice` are all native codegen expressions (no UDF under
    * the Generate — see the InferFiltersFromGenerate trap in Dedup), so
    * this runs at scan speed and parallelizes with the input splits. The
    * chunk signature (prefix of sha-256) stands in for the chunk payload
    * in the gate to keep output bounded. */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val W = 8
    val St = 6
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L),
          floor((size(col("w")) - 1) / St))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("w"), (col("chunk_idx") * St + 1).cast("int"), lit(W)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_tokens"),
        substring(sha2(array_join(col("chunk"), " "), 256), 1, 16).as("chunk_sig"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** q89: PII-style redaction — mask multi-digit runs in the event
    * payload and count the redactions. Map-only `regexp_replace` /
    * `regexp_extract_all` (codegen'd); the pattern set extends to
    * emails/phones/IPs without changing the plan shape. */
  private def q89(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        regexp_replace(col("props"), "[0-9]{2,}", "<NUM>").as("props_redacted"),
        size(regexp_extract_all(col("props"), lit("[0-9]{2,}"), lit(0)))
          .as("n_redacted"))
      .orderBy("event_id")

  /** q90: mixture (temperature) sampling — per-language keep rates
    * (en 1, fr 3/4, de 1/2, es 1/4, zh 1/8) applied by comparing a
    * content-hash prefix against the rate's exact 16-bit hex threshold.
    * Deterministic by content: membership is engine- and
    * cluster-size-independent, re-runs are stable, and rates are exact
    * binary fractions so the hex string compare IS the Bernoulli draw.
    * Map-only. */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val h4 = substring(
      sha2(concat(col("doc_id").cast("string"), lit("|"), col("lang")), 256), 1, 4)
    val thr = when(col("lang") === "fr", "c000")
      .when(col("lang") === "de", "8000")
      .when(col("lang") === "es", "4000")
      .when(col("lang") === "zh", "2000")
      .otherwise("0000")
    Tables.documents(s, dir)
      .filter(col("lang") === "en" || h4 < thr)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** q91: latest-record compaction (SCD-1 upsert / CDC merge): one row
    * per user carrying the most recent event, ties at the same
    * microsecond broken by event id. One hash shuffle on the key + a
    * per-key sort — the standard log-compaction shape; at scale the
    * window never sees more than one key's events in memory. */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("ts_us").as("last_ts_us"),
        col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** q92: inverted-index construction — 3-gram shingle → document
    * frequency + the first 20 postings (sorted doc ids). Typed flatMap
    * fan-out (per-doc-distinct grams), one hash shuffle on the gram.
    *
    * The postings head is RANKED BEFORE AGGREGATION: `row_number` over
    * (gram, doc_id) marks the 20 smallest doc ids per gram, and the
    * `collect_list` only ever buffers those ≤ 20 survivors
    * (`when(rn ≤ 20)` — collect_list drops nulls). Slicing AFTER a bare
    * collect_list would materialize a hot gram's entire postings list in
    * one aggregation buffer — at 100 TB a stop-word 3-gram has df in the
    * billions, so the bound is the difference between an index build and
    * an OOM. `df` still counts every row. The window's hash partitioning
    * on `g` is reused by the groupBy (one shuffle total), and the window
    * itself spills per-partition rather than buffering per-key.
    * Bounded-buffer shape pinned in PlanSpec. */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        (0 to w.length - 3).iterator
          .map(i => (id, s"${w(i)} ${w(i + 1)} ${w(i + 2)}")).distinct }
      .toDF("doc_id", "g")
    val wHead = Window.partitionBy("g").orderBy("doc_id")
    grams
      .withColumn("rn", row_number().over(wHead))
      .groupBy("g")
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(array_sort(collect_list(when(col("rn") <= 20, col("doc_id")))),
            x => x.cast("string")), ",").as("postings_head"))
      .orderBy("g")
  }

  /** q93: per-cluster embedding centroids — mean vector per label, laid
    * out as (label, pos, value) rows. The posexplode → two-level groupBy
    * shape is the scalable way to average vectors: the shuffle key
    * (label, pos) has cardinality labels×dims, so no single reducer ever
    * holds a whole cluster's vectors (vs. collect_list of arrays). */
  private def q93(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"), col("col").cast("double").as("v"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), round(avg(col("v")), 6).as("centroid_v"))
      .orderBy("label", "pos")

  /** q94: equi-width histogram of document lengths — 16 buckets between
    * the global min/max. Two passes: a 1-row min/max aggregate broadcast
    * back over the scan (never a driver-side collect), then bucket
    * counts. Bucket arithmetic is all-integer so the cut points are
    * bit-exact in any engine. */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("n_chars"))
    val mm = docs.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
    docs.crossJoin(broadcast(mm))
      .withColumn("bucket", expr("((n_chars - mn) * 16) div (mx - mn + 1)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .orderBy("bucket")
  }

  /** q98: one spherical k-means (Lloyd) iteration over the embedding
    * corpus — the clustering primitive behind cluster-then-curate
    * pipelines (SemDeDup-style pruning, diversity sampling): assign every
    * vector to its nearest of 16 deterministic centroids by cosine
    * (broadcast argmin — the corpus never shuffles for assignment), then
    * recompute centroids as dimension-wise means via posexplode →
    * (cid, pos) groupBy, so the shuffle key cardinality is
    * centroids×dims and no reducer ever holds whole vectors. Iterating
    * this query IS k-means at 100 TB: per step, one broadcast + one
    * bounded-key shuffle. */
  private def q98(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(s, "v", "v")))
    val cents = e.filter(col("vec_id") < 16).toDF("cid", "cv", "cnrm")
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid"))
    val assign = e.crossJoin(bcast(cents))
      .withColumn("ccos", round(
        graft.functions.VectorFunctions.dot(s, "v", "cv") /
          (col("nrm") * col("cnrm")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select("vec_id", "v", "cid")
    assign.select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos")
      .agg(count(lit(1)).as("n"), round(avg(col("col")), 6).as("centroid_v"))
      .orderBy("cid", "pos")
  }

  /** q111: stratified fixed-quota sample — exactly `Quota` documents per
    * source, chosen by content-hash order so the draw is deterministic at
    * any parallelism (the per-source counterpart of q90's per-language
    * Bernoulli rates; quotas are what mixture specs actually pin).
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY source)` hash-
    * shuffles EVERY row of a stratum to one reducer — a straggler when one
    * source dominates the corpus. Instead, two-level top-k: rank within
    * (source, input-partition) first — balanced by construction, prunes
    * each partition to ≤ Quota rows per source — then rank the ≤
    * Quota×partitions survivors per source. The global top-Quota of each
    * stratum is contained in the union of per-partition top-Quotas, so
    * the result is EXACTLY the single-window answer the oracle computes.
    */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    val quota = 40
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy("source", "pid").orderBy(col("h"), col("doc_id"))
    val pruned = base
      .withColumn("rk1", row_number().over(w1))
      .filter(col("rk1") <= quota)
    val w2 = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    pruned
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= quota)
      .select("doc_id", "source", "rk")
      .orderBy("source", "rk")
  }

  /** q120: equal-frequency length bucketing (exact ntile-8 semantics,
    * computed scalably) — the batch-shaping step that groups documents
    * of similar token counts so a training batch wastes minimal padding.
    * A naive `ntile(8) OVER (ORDER BY tokens, doc_id)` needs a
    * single-partition global sort — a 100 TB non-starter. Same result,
    * scalable shape: token counts are SMALL integers, so (1) a
    * bounded-key histogram (one map-side-combined shuffle) gives each
    * count's cumulative offset via a window over the tiny histogram,
    * (2) each doc's rank WITHIN its count comes from a window
    * partitioned by the bounded count key, and (3) global position =
    * offset + rank feeds the closed-form ntile bucket formula (first
    * N mod k buckets take ⌈N/k⌉ rows). No global sort ever happens;
    * the oracle runs the naive ntile and must agree exactly. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("tokens"))
    // bounded frame: one row per distinct token count
    val wCum = Window.orderBy("tokens")
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = docs.groupBy("tokens").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum("cnt").over(wCum), lit(0L)))
      .select("tokens", "offset")
    val n = docs.agg(count(lit(1)).as("n"))
    val wIn = Window.partitionBy("tokens").orderBy("doc_id")
    docs
      .withColumn("rn", row_number().over(wIn).cast("long"))
      .join(hist, "tokens")
      .crossJoin(broadcast(n))
      .withColumn("p", col("offset") + col("rn"))
      // integer `div`, not `/` (which widens to double on long operands)
      .withColumn("small", expr(s"n div $k"))
      .withColumn("r", col("n") % k)
      .withColumn("bucket",
        when(col("p") <= col("r") * (col("small") + 1),
          expr("(p - 1) div (small + 1) + 1"))
          .otherwise(expr("r + (p - r * (small + 1) - 1) div small + 1")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min("tokens").as("min_tokens"),
        max("tokens").as("max_tokens"), sum("tokens").as("sum_tokens"))
      .orderBy("bucket")
  }

  /** q121: weighted sampling WITHOUT replacement (Efraimidis–Spirakis) —
    * draw 50 docs with inclusion odds ∝ n_chars, deterministically: each
    * doc gets a content-hash uniform u ∈ (0,1) (md5, the q90 discipline —
    * reproducible at any parallelism) and log-domain key ln(u)/w; the
    * top-50 keys ARE the weighted sample. The heavy lifting is
    * `orderBy(key).limit(50)` — Spark plans TakeOrderedAndProject
    * (per-partition heaps + driver merge of 50-row heads, the q20 shape),
    * NEVER a global sort; the rank window then runs on the 50 surviving
    * rows. Keys round to 12 so the oracle's libm ln (vs the JVM's, each
    * ≤ 1 ulp off) can never reorder the selection. */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    val take = 50
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("w"),
        ((conv(substring(md5(concat(lit("ws:"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") + 1).cast("double") / lit(4294967297.0)).as("u"))
      .select(col("doc_id"), col("w"),
        round(log(col("u")) / col("w"), 12).as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(take)
    val w = Window.orderBy(col("key").desc, col("doc_id"))
    // the rank window sees only the 50 survivors — bounded by `take`
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "doc_id", "w", "key")
      .orderBy("rank")
  }

  /** q142: per-group feature standardization (z-score) — the classic
    * train-data normalization pass. Per-source moments come from ONE
    * small aggregate that is broadcast back onto the full scan, so the
    * big side never shuffles: at 100 TB this is a map-only second pass
    * over the documents.
    *
    * Determinism: variance is computed EXPLICITLY as
    * sum(x²)/n − (sum(x)/n)² on integer-valued `n_chars` — both sums
    * are exact integers in any engine, so mean/var/sqrt/round are
    * bit-identical; a builtin `stddev_pop` (Welford accumulation,
    * engine-specific merge order) could differ in the last ulp right at
    * a rounding boundary. */
  private def q142(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      col("n_chars").cast("double").as("x"))
    val stats = d.groupBy("source").agg(
      (sum("x") / count(lit(1))).as("mu"),
      sqrt(sum(col("x") * col("x")) / count(lit(1)) -
        (sum("x") / count(lit(1))) * (sum("x") / count(lit(1)))).as("sigma"))
    // degenerate groups (constant or single-doc source ⇒ sigma = 0) pin
    // to NULL explicitly on both engines: Spark's x/0.0 gives NaN while
    // DuckDB's differs by version, so an unguarded division would flip
    // the hash the day a fixture gains such a source (ADVICE r6)
    d.join(broadcast(stats), "source")
      .select(col("doc_id"), col("source"),
        when(col("sigma") > 0,
          round((col("x") - col("mu")) / col("sigma"), 6)).as("z"))
      .orderBy("doc_id")
  }

  /** q185: URL canonicalization + dedup — the first step of any web-
    * crawl curation pipeline: the same page arrives under many spellings
    * (case-varied scheme/host, `www.` prefix, explicit default port,
    * unsorted query strings, tracking params, fragments, trailing
    * slashes), and canonical-form grouping is what collapses them before
    * any content-level dedup runs. Rules are the standard RFC 3986 +
    * crawl-convention set: lowercase scheme and host, strip `www.`,
    * strip the scheme's default port, drop the fragment, drop tracking
    * params (`utm_*`, `ref`, `fbclid`, `gclid`), sort the remaining
    * query params, trim trailing path slashes. The whole canonicalizer
    * is `regexp_extract`/`split`/`filter`/`array_sort`/`array_join` —
    * codegen'd, no UDF — and the dedup is ONE hash shuffle on the
    * canonical string. Input is three deterministic spelling variants
    * per document (odd docs get a genuinely different third URL, so
    * group sizes vary); the oracle replays rules and variants in DuckDB
    * exactly. */
  private def q185(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val variants = array(
      concat(lit("https://example.com/articles/"), id, lit("?a=1&b=2")),
      concat(lit("HTTPS://WWW.Example.COM:443/articles/"), id,
        lit("/?b=2&a=1&utm_source=feed#frag")),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("https://EXAMPLE.com:443/articles/"), id,
          lit("/?utm_campaign=x&a=1&ref=rss&b=2")))
        .otherwise(concat(lit("https://example.com/alt/"), id)))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(variants).as("url"))
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("canon_url"))
      .groupBy("canon_url")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_merged"))
      .select(col("doc_id"), col("canon_url"), col("n_merged"))
      .orderBy("doc_id", "canon_url")
  }

  /** q185's canonicalizer as a reusable Column transform (rule-by-rule
    * pins in UrlCanonSpec): lowercase scheme+host, strip `www.` and the
    * scheme's default port, drop fragment and tracking params, sort the
    * surviving query params, trim trailing path slashes. Pure codegen'd
    * string expressions — usable in any projection at scan speed. */
  private[operators] def canonicalizeUrl(url: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQ, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|ref|fbclid|gclid)=")))
    val qs = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** q186: deterministic global dataset shuffle + shard assignment —
    * the step between curation and training: the corpus must be
    * re-ordered so correlated documents (same crawl batch, same source)
    * don't arrive in runs, and written into N balanced shards. The
    * shuffle key is a seeded content hash (`md5(doc_id || seed)`), so
    * the permutation is reproducible on any cluster size and re-keyed
    * by changing the seed; the shard is the key's first hex nibble (16
    * shards). The ORDER BY is the operator: Spark executes it as a
    * sampled range exchange + per-partition sort — the scalable
    * distributed shuffle — never a single-partition window.
    * `ROW_NUMBER`-style global positions are deliberately absent: a
    * contiguous global index forces either one partition or a second
    * pass; downstream trainers consume shard files in key order, which
    * this output IS. */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    val key = md5(concat(col("doc_id").cast("string"), lit("::seed42")))
    Tables.documents(s, dir)
      .select(col("doc_id"), key.as("shuffle_key"),
        substring(key, 1, 1).as("shard"))
      .orderBy("shuffle_key")
  }

  /** q188: hyperlink graph extraction — the web-graph construction step
    * of crawl curation: harvest every `href` from each page, reduce the
    * messy spellings to canonical form (reusing q185's
    * [[canonicalizeUrl]]), and aggregate link-graph statistics per
    * canonical target host (in-link count + distinct linking docs —
    * the inputs to domain-level quality ranking). The synthesized pages
    * carry one content link (host varies by doc), one always-present
    * hub link in deliberately messy spelling, and an odd-docs-only
    * partner link with default port + tracking param. Harvest is
    * `regexp_extract_all` group capture (map-only, codegen'd); the only
    * shuffle is the groupBy on host — at 100 TB the host key space is
    * millions, far below the doc count, so partial aggregation
    * collapses the traffic map-side. */
  private def q188(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val html = concat(
      lit("<p>See <a href=\"https://site"), pmod(id, lit(7)).cast("string"),
      lit(".example.org/page/"), pmod(id, lit(13)).cast("string"),
      lit("?x=1\">related</a> and <a href=\"HTTPS://WWW.Hub.Example.ORG:443/index\">the hub</a>."),
      when(pmod(id, lit(2)) === 1,
        lit(" <a href=\"http://partner.example.net:80/deals/?utm_source=banner\">deals</a>"))
        .otherwise(lit("")),
      lit("</p>"))
    Tables.documents(s, dir)
      .select(id,
        explode(regexp_extract_all(html, lit("href=\"([^\"]+)\""), lit(1)))
          .as("url"))
      .select(id,
        regexp_extract(canonicalizeUrl(col("url")), "^[^:/?#]+://([^/?#]*)", 1)
          .as("host"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_links"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("host")
  }

  /** q193: crawl snapshot diff — the incremental-ingestion
    * reconciliation step: given yesterday's and today's crawl of the
    * same keyspace, classify every URL/doc as added / removed /
    * changed / unchanged by comparing content fingerprints. The two
    * snapshots are synthesized deterministically from the documents
    * table (A drops doc_id ≡ 3 mod 7, B drops ≡ 5 mod 11 and rewrites
    * every 6th doc's content), fingerprints are sha-256 of the text,
    * and the diff is ONE full outer equi-join on the key — the classic
    * CDC shape: co-partitioned on the primary key, no windows, no
    * secondary shuffles, linear at any scale. */
  private def q193(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val snapA = docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
      .select(col("doc_id"), sha2(col("text"), 256).as("fp_a"))
    val snapB = docs.filter(pmod(col("doc_id"), lit(11)) =!= 5)
      .select(col("doc_id"),
        sha2(when(pmod(col("doc_id"), lit(6)) === 0,
          concat(col("text"), lit(" updated"))).otherwise(col("text")),
          256).as("fp_b"))
    snapA.join(snapB, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .orderBy("doc_id")
  }

  /** q272's two snapshots, shared with DataPrepSpec: synthesized from
    * the documents table with partition key `part = doc_id % 16`. The
    * drift is PARTITION-SPARSE on purpose — real replica divergence is
    * (a few late/failed partition loads, not uniform noise), and sparse
    * drift is what makes digest pruning worth its pass:
    *   - part 5 misses some rows in A  → "added" when B is the target
    *   - part 11 misses some rows in B → "removed"
    *   - part 3 has rewritten text in B → "changed"
    * The other 13 partitions are bit-identical and must be reconciled
    * from digests alone. */
  private[graft] def reconcileSnapshots(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val P = 16
    val part = pmod(col("doc_id"), lit(P))
    val docs = Tables.documents(s, dir)
    val a = docs.filter(!(part === 5 && pmod(col("doc_id"), lit(7)) === 1))
      .select(col("doc_id"), part.as("part"),
        sha2(col("text"), 256).as("fp"))
    val b = docs.filter(!(part === 11 && pmod(col("doc_id"), lit(5)) === 2))
      .select(col("doc_id"), part.as("part"),
        sha2(when(part === 3 && pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")),
          256).as("fp"))
    (a, b)
  }

  /** q272: partition-digest ANTI-ENTROPY reconciliation — how two
    * replicas of a 100 TB keyed table are actually compared. q193's
    * row-level full-outer diff is correct but touches every row of both
    * snapshots; at scale the standard trick (Merkle-style, as in
    * Dynamo/Cassandra anti-entropy) is TWO-LEVEL: first compare
    * per-partition DIGESTS — an order-independent fold of per-row
    * hashes, here sum(xxhash64(doc_id, fingerprint)) per `part` — and
    * only row-diff the partitions whose (digest, count) mismatch.
    *
    * Scale shape: the digest pass is one map-side-combined aggregate
    * per snapshot (16 groups — O(partitions) exchange bytes, O(N) scan);
    * the mismatched-partition list is O(partitions) and COLLECTED to
    * the driver (the repair driver needs it anyway), so the row-level
    * full-outer diff is gated by a LITERAL isin predicate — static
    * partition pruning on partitioned storage, and row comparison work
    * proportional to CHANGED partitions only. Matched partitions are
    * reported as zero-diff rows without any row comparison; the oracle
    * states the same report from the full row-level diff, so the gate
    * proves digest-pruning loses nothing. The digest is internal (both
    * engines never compare it) — sum-of-xxhash64 collisions across a
    * whole partition are the usual anti-entropy residual risk and the
    * reason production reconcilers also compare row counts, as this
    * does. */
  private def q272(s: SparkSession, dir: String): DataFrame = {
    val (snapA, snapB) = reconcileSnapshots(s, dir)
    def digest(df: DataFrame, n: String, d: String): DataFrame =
      df.groupBy("part").agg(
        count(lit(1)).as(n),
        sum(xxhash64(col("doc_id"), col("fp")).cast("decimal(38,0)")).as(d))
    val digests = digest(snapA, "n_a", "dig_a")
      .join(digest(snapB, "n_b", "dig_b"), Seq("part"), "full_outer")
    // the digest verdicts are O(partitions) — collect them ALL at the
    // driver in one pass (the anti-entropy repair driver holds this
    // list anyway). The row-diff stage then gets a LITERAL isin
    // predicate — static partition pruning on partitioned storage —
    // and the report skeleton is a 16-row LOCAL relation, so the final
    // plan contains NO digest subtree at all: 4 table scans total
    // (2 digest, 2 pruned row-diff), the minimum this algorithm can do.
    // Sorted so the pruning predicate (and the pinned plan) is
    // deterministic regardless of collect order.
    val digRows = digests
      .select(col("part"),
        ((col("dig_a") <=> col("dig_b")) &&
          (col("n_a") <=> col("n_b"))).as("matched"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      .sortBy(_._1).toSeq
    val mismatched: Seq[Long] = digRows.collect { case (p, false) => p }
    val detail = snapA.filter(col("part").isin(mismatched: _*))
      .select(col("doc_id"), col("part").as("pa"), col("fp").as("fp_a"))
      .join(snapB.filter(col("part").isin(mismatched: _*))
          .select(col("doc_id"), col("part").as("pb"), col("fp").as("fp_b")),
        Seq("doc_id"), "full_outer")
      .select(coalesce(col("pa"), col("pb")).as("part"),
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy("part").agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("d_add"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("d_rem"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("d_chg"))
    // every partition present in either snapshot reports; clean ones
    // ride through on the digest verdict alone (zeros, no row work).
    // The skeleton is the collected local list, and digest_match is the
    // TRUE digest verdict (not re-derived from diff counts) — the
    // oracle computes it as "zero diffs", so the gate's hash compare
    // asserts digest⇔row-diff agreement, the property the whole
    // two-level design rests on.
    import s.implicits._
    digRows.toDF("part", "digest_match")
      .join(detail, Seq("part"), "left")
      .select(col("part"),
        coalesce(col("d_add"), lit(0L)).as("n_added"),
        coalesce(col("d_rem"), lit(0L)).as("n_removed"),
        coalesce(col("d_chg"), lit(0L)).as("n_changed"),
        col("digest_match"))
      .orderBy("part")
  }

  /** q195: per-domain token-budget capping — the anti-spam/diversity
    * curation rule: no single domain may contribute more than B tokens
    * to the corpus. Unlike q111's per-source ROW quota, the cap is a
    * BUDGETED PREFIX: docs of a host are taken in deterministic
    * content-hash order until the cumulative token count would exceed
    * the budget (a doc that crosses the line is dropped, later smaller
    * docs are NOT back-filled — the one-pass prefix rule, so membership
    * is a pure function of the doc's rank and running sum). One hash
    * exchange on host, one running-sum window over it; the filter is
    * `cum ≤ B`. Host keyspace ≪ docs, so the shuffle partial-aggregates
    * nothing but also skews nothing worse than the true domain
    * distribution — the same salting answer as q110 applies if one
    * domain dominates. */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val host = concat(lit("site"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".example.org"))
    val wHost = Window.partitionBy("host")
      .orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.documents(s, dir)
      .select(col("doc_id"), host.as("host"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("rk"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wHost))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "host", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** q196: mixture upsampling — the repetition schedule that over-
    * samples scarce/high-quality slices when assembling a training
    * epoch: each doc is replicated `weight(lang)` times (en 3, fr 2,
    * others 1), every copy tagged with its epoch index and a
    * content-derived interleave key (`md5(doc‖epoch)`) so repeats
    * scatter through the global q186-style shuffle order instead of
    * clustering. Pure map-side fan-out: `explode(sequence(...))` is a
    * codegen generator, no shuffle except the presentation sort —
    * at 100 TB the fan-out multiplies output bytes, never shuffle
    * traffic. */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    val reps = when(col("lang") === "en", lit(3))
      .when(col("lang") === "fr", lit(2)).otherwise(lit(1))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), reps.as("n_reps"))
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), col("n_reps"))).as("epoch"))
      .withColumn("interleave_key",
        md5(concat(col("doc_id").cast("string"), lit("#"),
          col("epoch").cast("string"))))
      .orderBy("doc_id", "epoch")
  }

  /** q198: k-anonymity release gate with keyed pseudonymization — the
    * privacy step before an event dataset leaves the pipeline:
    * user ids are replaced by a keyed hash (consistent mapping, so
    * joins and distinct-counts still work downstream without exposing
    * the raw id), and any (event_type, day, value-band) quasi-
    * identifier group with fewer than k = 20 members is SUPPRESSED
    * (the standard k-anonymity rule: small groups re-identify — the
    * amount band is the classic linkable attribute). Output is the
    * group-level release audit: size, distinct pseudonyms, the
    * deterministic min pseudonym (pins the exact hash mapping across
    * engines), and the keep/suppress verdict — the sf0.01 fixture
    * realizes BOTH verdicts. One hash shuffle on the quasi-identifier;
    * the pseudonymization is a codegen'd sha-256 projection. At 100 TB
    * the group count is days × types × bands — tiny — so partial
    * aggregation collapses everything map-side. */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    val k = 20L
    Tables.events(s, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"),
        floor(col("value") / 25).cast("int").as("value_band"),
        substring(sha2(concat(lit("salt42|"),
          col("user_id").cast("string")), 256), 1, 16).as("pid"))
      .groupBy("event_type", "day", "value_band")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("pid")).as("n_users"),
        min(col("pid")).as("min_pid"))
      .withColumn("kept", col("n_events") >= k)
      .orderBy("event_type", "day", "value_band")
  }

  /** q200: one-scan curation funnel — the capstone audit that chains
    * the pipeline's flagship stages over a single pass and reports the
    * yield at each: URL-dedup (every doc_id ≡ 7 mod 10 re-crawls the
    * page of doc_id−7; keep the lowest doc_id per canonical key) →
    * quality floor (n_chars ≥ 120) → q90's deterministic mixture rule
    * (content-hash Bernoulli per language) → q186's shard assignment,
    * reported as distinct shards used by the survivors. Like q95's
    * cascade audit, every stage is a BOOLEAN on the same row set —
    * counts are conjunction sums in ONE aggregation, so the whole
    * funnel costs one scan + one window shuffle (the dedup
    * first-per-key rank) + a 1-row aggregate, not one job per stage.
    * The stage list unpivots through `stack`. */
  private def q200(s: SparkSession, dir: String): DataFrame = {
    val canonKey = col("doc_id") -
      when(pmod(col("doc_id"), lit(10)) === 7, lit(7)).otherwise(lit(0))
    val wKey = Window.partitionBy("canon_key").orderBy("doc_id")
    val h4 = substring(
      sha2(concat(col("doc_id").cast("string"), lit("|"), col("lang")), 256), 1, 4)
    val mixKeep = col("lang") === "en" ||
      h4 < when(col("lang") === "fr", lit("c000"))
        .when(col("lang") === "de", lit("8000"))
        .when(col("lang") === "es", lit("4000"))
        .otherwise(lit("2000"))
    val shard = substring(
      md5(concat(col("doc_id").cast("string"), lit("::seed42"))), 1, 1)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        canonKey.as("canon_key"), mixKeep.as("mix_keep"), shard.as("shard"))
      .withColumn("is_first", row_number().over(wKey) === 1)
      .withColumn("q_ok", col("n_chars") >= 120)
      .agg(
        count(lit(1)).as("ingest"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("after_dedup"),
        sum(when(col("is_first") && col("q_ok"), 1L).otherwise(0L))
          .as("after_quality"),
        sum(when(col("is_first") && col("q_ok") && col("mix_keep"), 1L)
          .otherwise(0L)).as("after_mixture"),
        countDistinct(when(col("is_first") && col("q_ok") && col("mix_keep"),
          col("shard"))).as("shards_used"))
      .selectExpr("stack(5, 'a_ingest', ingest, 'b_after_dedup', after_dedup, " +
        "'c_after_quality', after_quality, 'd_after_mixture', after_mixture, " +
        "'e_shards_used', shards_used) AS (stage, n)")
      .orderBy("stage")
  }

  /** q215: differential-privacy-style histogram release — per
    * (event_type, month) counts published with Laplace noise
    * (ε = 0.5 ⇒ scale b = 2, count sensitivity 1) and a release
    * threshold, the aggregate-release companion to q198's k-anonymity
    * gate. The noise is DERIVED DETERMINISTICALLY from a keyed rolling
    * hash of the cell label (inverse-CDF of Laplace on u = hash/10^15):
    * a real deployment swaps the hash for a secure RNG — one expression,
    * same plan — but the gate needs reproducibility so the DuckDB oracle
    * can re-derive the exact release (the same stub discipline as the
    * multimodal codecs). Everything is engine-neutral by construction:
    * the hash is the shared q53 polynomial (exact int64), u is an exact
    * double below 2^53, and both engines evaluate the identical
    * sign/ln/abs tree on it (log argument clamped away from 0 so a
    * pathological u = 0 or 1 can't produce ±∞ on either engine). Scale:
    * one map-side-combined count shuffle; the noise is a scalar
    * expression over the CELL frame (≤ types × months rows). */
  /** Deterministic Laplace(b) noise keyed on a cell label: inverse-CDF
    * on u = rollingHash(label)/10^15. Swap the hash for a secure RNG in
    * a real release; the expression tree (and the plan) stay the same.
    * Exposed for the branch-coverage spec (the driver fixtures' cells
    * all clear the q215 threshold, so suppression is pinned on
    * synthetic cells in DataPrepSpec). */
  private[operators] def dpLaplace(key: org.apache.spark.sql.Column,
      b: Double): org.apache.spark.sql.Column = {
    val codes = transform(regexp_extract_all(key, lit("."), lit(0)),
      c => ascii(c).cast("long"))
    val u = graft.functions.Exact.rollingHash(codes) / lit(1.0e15)
    // clamp the log argument away from 0: a pathological u = 0 or 1
    // would otherwise produce ±∞ (differently NaN-propagated per engine)
    val logArg = greatest(lit(1.0) - lit(2.0) * abs(u - lit(0.5)), lit(5.0e-16))
    lit(-b) * signum(u - lit(0.5)) * log(logArg)
  }

  private def q215(s: SparkSession, dir: String): DataFrame = {
    val b = 2.0 // Laplace scale = sensitivity / epsilon = 1 / 0.5
    val tau = 20.0 // publish only cells whose NOISY count clears this
    val key = concat_ws("|", col("event_type"), col("month"),
      lit("graft-dp-v1"))
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy", col("n") + dpLaplace(key, b))
      .select(col("event_type"), col("month"),
        (col("noisy") >= tau).as("released"),
        when(col("noisy") >= tau, round(col("noisy"), 4)).as("value"))
      .orderBy("event_type", "month")
  }

  /** q216: deterministic negative sampling for contrastive training —
    * for each anchor document, k pseudo-random corpus negatives drawn by
    * keyed hash (candidate id = H(anchor|j) mod N), keeping only
    * cross-source candidates (the cheap "not a positive" proxy; a
    * near-dup exclusion would anti-join q66's components the same way).
    * Hash-seeded draws instead of an RNG for the usual two reasons: the
    * sample is REPRODUCIBLE across retries/stragglers at 100 TB (any
    * task can recompute any row), and the oracle can re-derive it
    * exactly. Scale shape: anchors×k candidate rows equi-join the corpus
    * on the computed id (work ∝ sample size, never anchors×corpus), the
    * corpus size enters as a 1-row broadcast, and a candidate id that
    * does not exist (sparse id space) simply drops out of the inner join
    * on BOTH engines — k is a budget, not a guarantee, exactly like
    * rejection sampling in production. */
  private def q216(s: SparkSession, dir: String): DataFrame = {
    val k = 4
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val cand = docs.filter(col("doc_id") % 50 === 0)
      .withColumnRenamed("source", "anchor_source")
      .withColumnRenamed("doc_id", "anchor_id")
      .select(col("anchor_id"), col("anchor_source"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .crossJoin(broadcast(nDf))
      .select(col("anchor_id"), col("anchor_source"), col("j"),
        pmod(graft.functions.Exact.rollingHash(
          transform(regexp_extract_all(
            concat_ws("|", lit("neg"), col("anchor_id"), col("j"),
              lit("graft-negsample-v1")), lit("."), lit(0)),
            c => ascii(c).cast("long"))), col("n_docs")).as("neg_id"))
    cand
      .join(docs.withColumnRenamed("source", "neg_source"),
        col("neg_id") === col("doc_id"))
      .filter(col("neg_source") =!= col("anchor_source"))
      .select("anchor_id", "j", "neg_id", "neg_source")
      .orderBy("anchor_id", "j")
  }

  /** q223: feature hashing (the "hashing trick", Weinberger et al. 2009)
    * — tokens map to a FIXED 64-dim index space by content hash with a
    * ±1 sign hash, the unbiased collision-folding featurizer used where
    * a learned vocabulary is impossible (streaming/new tokens). No
    * vocabulary pass, no dictionary broadcast, no OOV: the featurizer is
    * a pure per-token function, so the whole query is one explode + one
    * map-side-combined (doc, idx) aggregation — the dimensioning step
    * that feeds a linear probe/classifier at 100 TB without ever
    * building the 10M-term vocab q214 sizes. Hash and sign come from
    * sha-256 hex prefixes (the q90/q121 content-hash discipline), so the
    * oracle recomputes them verbatim; all weights are exact integer sign
    * sums. */
  private def q223(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val hex = sha2(concat(lit("fh:"), col("tok")), 256)
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      .select(col("doc_id"),
        pmod(conv(substring(hex, 1, 8), 16, 10).cast("long"), lit(dim))
          .as("idx"),
        when(substring(hex, 9, 1) < "8", 1L).otherwise(-1L).as("sgn"))
      .groupBy("doc_id", "idx").agg(sum("sgn").as("w"))
      .orderBy("doc_id", "idx")
  }

  /** q231: frequency-ordered label encoding (StringIndexer) — the
    * categorical→dense-int dictionary every tabular/embedding trainer
    * needs: index 0 = most frequent label, ties broken lexically, so the
    * encoding is fully deterministic and frequency-meaningful (rare
    * labels get large indices a model can bucket). The complement of
    * q223's hashing trick: here the vocabulary IS materialized because
    * the label space (languages) is small and index semantics matter.
    *
    * Scale shape: one map-side-combined count shuffle to the VOCAB-sized
    * frame; the row_number window runs on that frame only (≤ |labels|
    * rows, never the corpus); the dictionary re-enters as a broadcast
    * join, so the corpus is touched exactly once with no row-level
    * window or second shuffle. */
  private def q231(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val wIdx = Window.orderBy(col("n_docs").desc, col("lang"))
    val dict = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("lang_idx", row_number().over(wIdx) - 1)
    docs.join(broadcast(dict), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("lang_idx"), col("n_docs"))
      .orderBy("doc_id")
  }

  /** q241: path-hierarchy rollup (`du` over a namespace) — per-directory
    * file counts and byte totals at EVERY ancestor level, when the
    * hierarchy lives inside a single path column (object-store keys,
    * crawl URLs, dataset shard layouts) rather than in separate columns
    * a CUBE/ROLLUP could use. Each path explodes into its ancestor
    * prefixes (slice + array_join over the split — codegen HOFs), then
    * ONE count/sum shuffle serves all depths at once: work is
    * Σ depth ≈ 4× the scan, vs one full scan per level for the naive
    * per-depth loop, and the output is directory-cardinality-sized.
    * The leaf (file) level is excluded so the result stays a namespace
    * summary, not a copy of the listing. */
  private def q241(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(concat(lit("corpus/"), col("source"), lit("/"), col("lang"),
        lit("/b"), pmod(col("doc_id"), lit(10)), lit("/doc_"),
        col("doc_id"), lit(".txt")).as("path"), col("n_chars"))
      .withColumn("parts", split(col("path"), "/"))
    d.select(explode(transform(
        sequence(lit(1), size(col("parts")) - 1),
        k => array_join(slice(col("parts"), lit(1), k), "/"))).as("dir_path"),
        col("n_chars"))
      .groupBy("dir_path")
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("total_chars"))
      .withColumn("depth", size(split(col("dir_path"), "/")))
      .select(col("dir_path"), col("depth"), col("n_files"), col("total_chars"))
      .orderBy("dir_path")
  }

  override def queries: Seq[Q] = Seq(
    Q("q241_path_rollup", q241, Some(
      """WITH d AS (SELECT 'corpus/' || source || '/' || lang || '/b' ||
        |    CAST(doc_id % 10 AS VARCHAR) || '/doc_' ||
        |    CAST(doc_id AS VARCHAR) || '.txt' AS path, n_chars
        |  FROM documents),
        |p AS (SELECT string_split(path, '/') AS parts, n_chars FROM d),
        |x AS (SELECT array_to_string(parts[1:g.k], '/') AS dir_path,
        |    n_chars
        |  FROM p CROSS JOIN (SELECT unnest(range(1, 5)) AS k) g
        |  WHERE g.k <= len(parts) - 1)
        |SELECT dir_path, len(string_split(dir_path, '/')) AS depth,
        |  count(*) AS n_files,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("q231_label_encoding", q231, Some(
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
        |  GROUP BY 1),
        |i AS (SELECT lang, n_docs,
        |    CAST(row_number() OVER (ORDER BY n_docs DESC, lang) - 1 AS INT)
        |      AS lang_idx
        |  FROM c)
        |SELECT d.doc_id, d.lang, i.lang_idx, i.n_docs
        |FROM documents d JOIN i USING (lang) ORDER BY d.doc_id""".stripMargin)),
    Q("q223_feature_hashing", q223, Some(
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    CAST(('0x' || substr(sha256('fh:' || tok), 1, 8))::UBIGINT % 64
        |      AS BIGINT) AS idx,
        |    CASE WHEN substr(sha256('fh:' || tok), 9, 1) < '8'
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM t)
        |SELECT doc_id, idx, CAST(sum(sgn) AS BIGINT) AS w
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("q216_negative_sampling", q216, Some(
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |a AS (SELECT doc_id AS anchor_id, source AS anchor_source
        |      FROM documents WHERE doc_id % 50 = 0),
        |c AS (SELECT anchor_id, anchor_source,
        |    unnest(generate_series(1, 4)) AS j FROM a),
        |h AS (SELECT anchor_id, anchor_source, j,
        |    list_reduce(list_prepend(0, list_transform(
        |        regexp_extract_all(
        |          'neg' || '|' || anchor_id || '|' || j ||
        |          '|graft-negsample-v1', '.'),
        |        x -> CAST(ascii(x) AS BIGINT))),
        |      (acc, v) -> (acc * 31 + v) % 1000000000000000)
        |      % (SELECT n_docs FROM n) AS neg_id
        |  FROM c)
        |SELECT anchor_id, j, neg_id, d.source AS neg_source
        |FROM h JOIN documents d ON h.neg_id = d.doc_id
        |WHERE d.source <> anchor_source
        |ORDER BY anchor_id, j""".stripMargin)),
    Q("q215_dp_histogram", q215, Some(
      """WITH c AS (SELECT event_type, strftime(ts, '%Y-%m') AS month,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT *,
        |    list_reduce(list_prepend(0, list_transform(
        |        regexp_extract_all(
        |          event_type || '|' || month || '|graft-dp-v1', '.'),
        |        x -> CAST(ascii(x) AS BIGINT))),
        |      (a, v) -> (a * 31 + v) % 1000000000000000)
        |      / 1000000000000000.0 AS u
        |  FROM c),
        |r AS (SELECT event_type, month, n,
        |    n + -2.0 * sign(u - 0.5) *
        |      ln(greatest(1.0 - 2.0 * abs(u - 0.5), 5e-16)) AS noisy
        |  FROM h)
        |SELECT event_type, month, noisy >= 20.0 AS released,
        |  CASE WHEN noisy >= 20.0 THEN round(noisy, 4) END AS value
        |FROM r ORDER BY 1, 2""".stripMargin)),
    Q("q200_curation_funnel", q200, Some(
      """WITH t AS (SELECT doc_id, lang, n_chars,
        |    doc_id - CASE WHEN doc_id % 10 = 7 THEN 7 ELSE 0 END AS canon_key,
        |    (lang = 'en' OR
        |      substring(sha256(CAST(doc_id AS VARCHAR) || '|' || lang), 1, 4) <
        |      CASE lang WHEN 'fr' THEN 'c000' WHEN 'de' THEN '8000'
        |                WHEN 'es' THEN '4000' ELSE '2000' END) AS mix_keep,
        |    substring(md5(CAST(doc_id AS VARCHAR) || '::seed42'), 1, 1) AS shard
        |  FROM documents),
        |f AS (SELECT *,
        |    row_number() OVER (PARTITION BY canon_key ORDER BY doc_id) = 1
        |      AS is_first,
        |    n_chars >= 120 AS q_ok FROM t),
        |s AS (SELECT count(*) AS ingest,
        |    sum(CASE WHEN is_first THEN 1 ELSE 0 END) AS after_dedup,
        |    sum(CASE WHEN is_first AND q_ok THEN 1 ELSE 0 END) AS after_quality,
        |    sum(CASE WHEN is_first AND q_ok AND mix_keep THEN 1 ELSE 0 END)
        |      AS after_mixture,
        |    count(DISTINCT CASE WHEN is_first AND q_ok AND mix_keep
        |      THEN shard END) AS shards_used
        |  FROM f)
        |SELECT stage, CAST(n AS BIGINT) AS n FROM (
        |  SELECT 'a_ingest' AS stage, ingest AS n FROM s
        |  UNION ALL SELECT 'b_after_dedup', after_dedup FROM s
        |  UNION ALL SELECT 'c_after_quality', after_quality FROM s
        |  UNION ALL SELECT 'd_after_mixture', after_mixture FROM s
        |  UNION ALL SELECT 'e_shards_used', shards_used FROM s)
        |ORDER BY stage""".stripMargin)),
    Q("q198_k_anonymity", q198, Some(
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(floor(value / 25) AS INT) AS value_band,
        |  count(*) AS n_events,
        |  count(DISTINCT substring(sha256('salt42|' ||
        |    CAST(user_id AS VARCHAR)), 1, 16)) AS n_users,
        |  min(substring(sha256('salt42|' ||
        |    CAST(user_id AS VARCHAR)), 1, 16)) AS min_pid,
        |  count(*) >= 20 AS kept
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY event_type, day, value_band""".stripMargin)),
    Q("q195_domain_token_cap", q195, Some(
      """WITH t AS (SELECT doc_id,
        |    'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS host,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        |c AS (SELECT doc_id, host, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY host ORDER BY rk, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, host, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 1000 ORDER BY doc_id""".stripMargin)),
    Q("q196_mixture_upsample", q196, Some(
      """WITH r AS (SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 3 WHEN 'fr' THEN 2 ELSE 1 END AS n_reps
        |  FROM documents)
        |SELECT doc_id, lang, unnest(generate_series(1, n_reps)) AS epoch,
        |  md5(CAST(doc_id AS VARCHAR) || '#' ||
        |      CAST(unnest(generate_series(1, n_reps)) AS VARCHAR))
        |    AS interleave_key
        |FROM r ORDER BY doc_id, epoch""".stripMargin)),
    Q("q272_partition_reconcile", q272, Some(
      """WITH a AS (SELECT doc_id, doc_id % 16 AS part, sha256(text) AS fp
        |  FROM documents
        |  WHERE NOT (doc_id % 16 = 5 AND doc_id % 7 = 1)),
        |b AS (SELECT doc_id, doc_id % 16 AS part,
        |    sha256(CASE WHEN doc_id % 16 = 3 AND doc_id % 3 = 0
        |                THEN text || ' v2' ELSE text END) AS fp
        |  FROM documents
        |  WHERE NOT (doc_id % 16 = 11 AND doc_id % 5 = 2)),
        |d AS (SELECT coalesce(a.part, b.part) AS part,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN a.fp <> b.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM a FULL JOIN b ON a.doc_id = b.doc_id)
        |SELECT part,
        |  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed,
        |  sum(CASE WHEN status <> 'unchanged' THEN 1 ELSE 0 END) = 0
        |    AS digest_match
        |FROM d GROUP BY part ORDER BY part""".stripMargin)),
    Q("q193_snapshot_diff", q193, Some(
      """WITH a AS (SELECT doc_id, sha256(text) AS fp_a FROM documents
        |           WHERE doc_id % 7 <> 3),
        |b AS (SELECT doc_id,
        |    sha256(CASE WHEN doc_id % 6 = 0 THEN text || ' updated'
        |                ELSE text END) AS fp_b
        |  FROM documents WHERE doc_id % 11 <> 5)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN fp_a <> fp_b THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM a FULL JOIN b ON a.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin)),
    Q("q188_link_graph", q188, Some(
      """WITH u AS (SELECT doc_id, unnest(regexp_extract_all(
        |    '<p>See <a href="https://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.org/page/' || CAST(doc_id % 13 AS VARCHAR) ||
        |    '?x=1">related</a> and <a href="HTTPS://WWW.Hub.Example.ORG:443/index">the hub</a>.' ||
        |    CASE WHEN doc_id % 2 = 1
        |      THEN ' <a href="http://partner.example.net:80/deals/?utm_source=banner">deals</a>'
        |      ELSE '' END || '</p>',
        |    'href="([^"]+)"', 1)) AS url FROM documents),
        |h AS (SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |                   '^www\.', '') AS nowww
        |  FROM u),
        |c AS (SELECT doc_id,
        |    CASE WHEN scheme = 'https' THEN regexp_replace(nowww, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(nowww, ':80$', '')
        |         ELSE nowww END AS host FROM h)
        |SELECT host, count(*) AS n_links, count(DISTINCT doc_id) AS n_docs
        |FROM c GROUP BY host ORDER BY host""".stripMargin)),
    Q("q185_url_canonicalize", q185, Some(
      """WITH u AS (SELECT doc_id, unnest([
        |    'https://example.com/articles/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2',
        |    'HTTPS://WWW.Example.COM:443/articles/' || CAST(doc_id AS VARCHAR) || '/?b=2&a=1&utm_source=feed#frag',
        |    CASE WHEN doc_id % 2 = 0
        |      THEN 'https://EXAMPLE.com:443/articles/' || CAST(doc_id AS VARCHAR) || '/?utm_campaign=x&a=1&ref=rss&b=2'
        |      ELSE 'https://example.com/alt/' || CAST(doc_id AS VARCHAR) END
        |  ]) AS url FROM documents),
        |c AS (SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
        |                   '^www\.', '') AS nowww,
        |    regexp_replace(regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
        |                   '/+$', '') AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS rawq
        |  FROM u),
        |k AS (SELECT doc_id, scheme,
        |    CASE WHEN scheme = 'https' THEN regexp_replace(nowww, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(nowww, ':80$', '')
        |         ELSE nowww END AS host,
        |    path,
        |    array_to_string(list_sort([p FOR p IN string_split(rawq, '&')
        |      IF p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid|gclid)=')]),
        |      '&') AS qs
        |  FROM c)
        |SELECT min(doc_id) AS doc_id,
        |  scheme || '://' || host || path ||
        |    CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canon_url,
        |  count(*) AS n_merged
        |FROM k GROUP BY 2 ORDER BY doc_id, canon_url""".stripMargin)),
    Q("q186_dataset_shuffle", q186, Some(
      """SELECT doc_id,
        |  md5(CAST(doc_id AS VARCHAR) || '::seed42') AS shuffle_key,
        |  substr(md5(CAST(doc_id AS VARCHAR) || '::seed42'), 1, 1) AS shard
        |FROM documents ORDER BY shuffle_key""".stripMargin)),
    Q("q121_weighted_sample", q121, Some(
      """WITH s AS (
        |  SELECT doc_id, n_chars AS w,
        |    round(ln((('0x' || substr(md5('ws:' || doc_id), 1, 8))::UBIGINT + 1)
        |            / 4294967297.0) / n_chars, 12) AS key
        |  FROM documents)
        |SELECT rank, doc_id, w, key FROM (
        |  SELECT doc_id, w, key,
        |    row_number() OVER (ORDER BY key DESC, doc_id) AS rank FROM s)
        |WHERE rank <= 50 ORDER BY rank""".stripMargin)),
    Q("q120_length_ntile", q120, Some(
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |           FROM documents),
        |b AS (SELECT doc_id, tokens,
        |        ntile(8) OVER (ORDER BY tokens, doc_id) AS bucket FROM d)
        |SELECT bucket, count(*) AS n_docs, min(tokens) AS min_tokens,
        |  max(tokens) AS max_tokens, CAST(sum(tokens) AS BIGINT) AS sum_tokens
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),
    Q("q88_chunk_overlap", q88, Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |k AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // 6)) AS chunk_idx FROM t),
        |c AS (SELECT doc_id, chunk_idx,
        |        w[chunk_idx * 6 + 1 : least(chunk_idx * 6 + 8, len(w))] AS chunk FROM k)
        |SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
        |  substring(sha256(array_to_string(chunk, ' ')), 1, 16) AS chunk_sig
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),
    Q("q89_pii_redact", q89, Some(
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]{2,}', '<NUM>', 'g') AS props_redacted,
        |  len(regexp_extract_all(props, '[0-9]{2,}')) AS n_redacted
        |FROM events ORDER BY event_id""".stripMargin)),
    Q("q90_mixture_sample", q90, Some(
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang = 'en'
        |   OR substring(sha256(CAST(doc_id AS VARCHAR) || '|' || lang), 1, 4) <
        |      CASE lang WHEN 'fr' THEN 'c000' WHEN 'de' THEN '8000'
        |                WHEN 'es' THEN '4000' WHEN 'zh' THEN '2000'
        |                ELSE '0000' END
        |ORDER BY doc_id""".stripMargin)),
    Q("q111_stratified_quota", q111, Some(
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source, rk FROM r WHERE rk <= 40
        |ORDER BY source, rk""".stripMargin)),
    Q("q91_upsert_latest", q91, Some(
      """WITH r AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_event_type, ts_us AS last_ts_us,
        |  value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),
    Q("q92_inverted_index", q92, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |          FOR i IN generate_series(1, len(w) - 2)])) AS g FROM toks)
        |SELECT g, count(*) AS df,
        |  array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings_head
        |FROM sh GROUP BY g ORDER BY g""".stripMargin)),
    Q("q93_cluster_centroids", q93, Some(
      """SELECT label, i - 1 AS pos, count(*) AS n,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid_v
        |FROM embeddings, generate_series(1, 64) t(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("q98_kmeans_step", q98, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |assign AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
        |          c.cid) AS rn
        |    FROM e, c) WHERE rn = 1)
        |SELECT cid, i - 1 AS pos, count(*) AS n,
        |  round(avg(v[i]), 6) AS centroid_v
        |FROM assign, generate_series(1, 64) t(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    Q("q94_length_histogram", q94, Some(
      """WITH mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents)
        |SELECT ((n_chars - mn) * 16) // (mx - mn + 1) AS bucket,
        |  count(*) AS n_docs, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents, mm GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("q142_zscore", q142, Some(
      """WITH st AS (
        |  SELECT source,
        |    sum(n_chars::DOUBLE) / count(*) AS mu,
        |    sqrt(sum(n_chars::DOUBLE * n_chars::DOUBLE) / count(*) -
        |      (sum(n_chars::DOUBLE) / count(*)) *
        |      (sum(n_chars::DOUBLE) / count(*))) AS sigma
        |  FROM documents GROUP BY source)
        |SELECT doc_id, source,
        |  CASE WHEN sigma > 0
        |       THEN round((n_chars::DOUBLE - mu) / sigma, 6) END AS z
        |FROM documents JOIN st USING (source)
        |ORDER BY doc_id""".stripMargin)),
  )
}
