package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact-arithmetic helpers used across the query packs. One
  * definition so a precision or modulus change can't silently diverge
  * between operators and their oracles.
  */
object Exact {

  /** Money/quantity values as exact decimals: sums become independent of
    * partial-aggregation order (the DuckDB hash-compare requirement, and
    * what lets AQE re-split partitions freely at scale). */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Modulus for the polynomial rolling hash: large enough to
    * discriminate, small enough that acc*31+c never overflows int64. */
  val RollingHashMod = 1000000000000000L

  /** Polynomial rolling hash over an array<long> of codes —
    * fold((acc, c) => (acc*31 + c) mod M, 0). Oracle equivalent:
    * list_reduce(list_prepend(0, codes), (a,b) -> (a*31+b) % M). */
  def rollingHash(codes: Column): Column =
    aggregate(codes, lit(0L), (acc, c) => (acc * 31 + c) % RollingHashMod)
}
