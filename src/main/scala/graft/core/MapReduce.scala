package graft.core

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

/** The generic user-function-driven MapReduce surface of the reference
  * engine (`/root/reference/mapreduce.py:139-187`), re-expressed on Spark.
  *
  * Reference semantics honored:
  *   - `mapFcn` is a generator: 0..n `(k, v)` outputs per input record
  *     (mapreduce.py:16) → `Dataset.flatMap`.
  *   - `reduceFcn` is *holistic*: it sees every value of a key in one call
  *     (mapreduce.py:17-18, 132-133) — so the default path is
  *     `groupByKey(...).mapGroups(...)`, never a partial-aggregating
  *     `Aggregator`, unless the caller opts in via [[runAssociative]].
  *   - Keys are generic `K : Encoder` — the documented contract
  *     (mapreduce.py:18), not the snapshot's str-only sharder
  *     (mapreduce.py:70, a latent bug; see SURVEY.md §1.1).
  *   - Output order is unspecified, as in the reference
  *     (mapreduce.py:161-163); callers sort when determinism matters.
  *
  * Scale notes (100 TB): the default path is a single hash-shuffle on the
  * key with Spark's spillable object-hash aggregation; value groups are
  * streamed to `reduceFcn` as an `Iterator` (the reference materializes a
  * list per key in reducer memory, mapreduce.py:118 — callers that need
  * random access can `.toSeq`, accepting the same memory profile). When
  * the reduce function is associative+commutative, use [[runAssociative]]
  * to get map-side partial aggregation (the reference has none —
  * SURVEY.md §2.1 O8).
  */
object MapReduce {

  /** Bulk API — analog of `MapReduceBulk` (mapreduce.py:139-164).
    *
    * @param numPartitions explicit reducer-parallelism knob (the
    *   reference's `num_reducers`). `None` (recommended) lets
    *   `spark.sql.shuffle.partitions` + AQE choose; `Some(n)` forces an
    *   exact hash-partitioning into n shards, reproducing the reference
    *   topology: one shuffle, hash(key) mod n (mapreduce.py:64-73).
    */
  def run[D, K, V, R](
      ds: Dataset[D],
      mapFcn: D => IterableOnce[(K, V)],
      reduceFcn: (K, Iterator[V]) => R,
      numPartitions: Option[Int] = None)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      rEnc: Encoder[R]): Dataset[R] = {
    val mapped = ds.flatMap(mapFcn)
    numPartitions match {
      case None =>
        mapped.groupByKey(_._1).mapGroups((k, it) => reduceFcn(k, it.map(_._2)))
      case Some(n) =>
        // Exact reference topology: hash-partition by key into n shards
        // (one shuffle — every value of a key co-locates because
        // repartition(n, key) hashes the full key), then sort within the
        // shard and stream each key's run to reduceFcn. Spark's sort
        // spills, so a shard larger than executor memory still works —
        // nothing is buffered per key unless reduceFcn itself does.
        // Requires an orderable key type (all atomics and case classes).
        mapped
          .repartition(n, col("_1"))
          .sortWithinPartitions("_1")
          .mapPartitions { it =>
            val buf = it.buffered
            new Iterator[R] {
              override def hasNext: Boolean = buf.hasNext
              override def next(): R = {
                val k = buf.head._1
                val run = new Iterator[V] {
                  override def hasNext: Boolean = buf.hasNext && buf.head._1 == k
                  override def next(): V = buf.next()._2
                }
                val r = reduceFcn(k, run)
                while (run.hasNext) run.next() // drain if fn under-consumed
                r
              }
            }
          }
    }
  }

  /** Placement-controlled variant — analog of the reference's pluggable
    * `distribute_work_fcn` (mapreduce.py:139,145-146,176-181): the caller
    * decides which mapper shard processes each input record, instead of
    * the engine's default distribution. The reference's hook assigns work
    * CHUNKS to mapper actors; on Spark, placement of records into map
    * tasks is a partitioning, so the hook is `(record, numMappers) =>
    * shard` and the engine realizes it with an IDENTITY `Partitioner` on
    * the computed shard id before the map phase: shard s IS partition s.
    * (A hash-repartition on the shard id would re-hash it — murmur3 can
    * map distinct shards to the same partition, leaving some mappers
    * empty and doubling others, which defeats an even-packing placement.)
    *
    * Placement is result-transparent by construction (same records, same
    * mapFcn/reduceFcn — only task locality changes), which
    * MapReducePropertySpec pins by golden-comparing against [[run]].
    * Legitimate uses at scale: co-locating records that share expensive
    * map-side state (a dictionary shard, a model partition), or packing
    * skewed inputs evenly when record cost is known to the caller —
    * knowledge Spark's size-based splitting doesn't have.
    */
  def runWithPlacement[D, K, V, R](
      ds: Dataset[D],
      mapFcn: D => IterableOnce[(K, V)],
      reduceFcn: (K, Iterator[V]) => R,
      placeFcn: (D, Int) => Int,
      numMappers: Int,
      numPartitions: Option[Int] = None)(implicit
      dEnc: Encoder[D],
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      rEnc: Encoder[R]): Dataset[R] = {
    require(numMappers > 0, "numMappers must be positive")
    val identityPart = new org.apache.spark.Partitioner {
      override def numPartitions: Int = numMappers
      override def getPartition(key: Any): Int = {
        val m = key.asInstanceOf[Int] % numMappers
        if (m < 0) m + numMappers else m
      }
    }
    implicit val dTag: scala.reflect.ClassTag[D] = dEnc.clsTag
    val placedRdd = ds.rdd
      .map(d => (placeFcn(d, numMappers), d))
      .partitionBy(identityPart)
      .values
    val placed = ds.sparkSession.createDataset(placedRdd)(dEnc)
    run(placed, mapFcn, reduceFcn, numPartitions)
  }

  /** Associative fast path: when `reduceFcn` is a commutative monoid fold,
    * Spark can partially aggregate map-side before the shuffle — the
    * optimization the reference lacks entirely (SURVEY.md §4.1). Semantics
    * equal `run` with `reduceFcn = (k, vs) => out(vs.reduce(merge))`.
    */
  def runAssociative[D, K, V](
      ds: Dataset[D],
      mapFcn: D => IterableOnce[(K, V)],
      merge: (V, V) => V)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      vEnc: Encoder[V]): Dataset[(K, V)] =
    ds.flatMap(mapFcn).groupByKey(_._1).mapValues(_._2).reduceGroups(merge)

  /** Single-text-file API — analog of `MapReduceWithOneFileInput`
    * (mapreduce.py:167-173). Unlike the reference, the file does NOT
    * stream through the driver (its acknowledged bottleneck,
    * mapreduce.py:25-26): Spark splits it across executors.
    *
    * Reference line semantics: lines keep their trailing `\n` there;
    * Spark strips terminators — documented delta (SURVEY.md §1.1), no
    * observable difference for the reference's own workloads.
    */
  def runOnTextFile[K, V, R](
      spark: SparkSession,
      path: String,
      mapFcn: String => IterableOnce[(K, V)],
      reduceFcn: (K, Iterator[V]) => R,
      ignoreFirstLine: Boolean = false,
      numPartitions: Option[Int] = None)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      rEnc: Encoder[R]): Dataset[R] = {
    import spark.implicits._
    val lines0 = spark.read.textFile(path)
    val lines =
      if (!ignoreFirstLine) lines0
      else {
        // Drop the first line of the (single) file without collecting it:
        // zipWithIndex is a narrow pass over already-ordered text splits.
        lines0.rdd.zipWithIndex.filter(_._2 > 0L).map(_._1).toDS()
      }
    run(lines, mapFcn, reduceFcn, numPartitions)
  }

  /** Multi-file API — analog of `MapReduceWithMultipleFiles`
    * (mapreduce.py:176-187): an index file lists one data-file URI per
    * line. The reference round-robins whole files to mappers; Spark goes
    * further and splits every file into byte-range tasks.
    */
  def runOnFileIndex[K, V, R](
      spark: SparkSession,
      indexPath: String,
      mapFcn: String => IterableOnce[(K, V)],
      reduceFcn: (K, Iterator[V]) => R,
      numPartitions: Option[Int] = None)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      rEnc: Encoder[R]): Dataset[R] = {
    val files = spark.read.textFile(indexPath)
      .collect().map(_.trim).filter(_.nonEmpty) // index file is small: file list only
    run(spark.read.textFile(files: _*), mapFcn, reduceFcn, numPartitions)
  }
}
