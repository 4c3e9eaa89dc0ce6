#!/usr/bin/env python3
"""Build a DERIVED bench-only scale-up of a driver fixture dir (dev tool,
like selfcheck.py — never imported by library code).

Usage: python3 scripts/make_scale.py <src_sf_dir> <out_dir> <factor>

Replicates every table <factor> times so Bench can measure a third scale
point (sf0.1 x10 ~ "sf1") for the SCALING.md exponent fits. Replication
is NOT verbatim — verbatim copies would distort exactly the operators
the measurement is about (near-dup detectors would see every replica
group as a 10-clique, exploding verify pairs quadratically in the
factor). Instead each replica i > 0 is made disjoint while preserving
within-replica structure:

  - surrogate + foreign keys shift by i * 10_000_000 consistently
    (orders.o_custkey moves with customer.c_custkey, etc.), so joins
    keep exactly one match where they had one;
  - document text gets a word-level bijection salt (every word prefixed
    with "r<i>"): within-replica shingle Jaccard is EXACTLY preserved,
    across replicas no shingle collides — duplicate-group sizes stay
    constant and group count scales linearly, the realistic corpus-growth
    shape;
  - embeddings rotate dimensions by 7*i (circularly): norms and
    within-replica cosines are exactly preserved, cross-replica cosines
    decorrelate — IVF/LSH bucket occupancy grows the way a real corpus
    grows rather than by piling identical vectors into one cell;
  - the tiny fixed dims (region, nation) stay as-is, as they would at
    any TPC-H scale factor.

The key offset keeps user_id parity (10_000_000 is even), which the
stream-stratum gates rely on.
"""
import sys

import duckdb

KOFF = 10_000_000

# per-table replication rules: SQL select for replica index {i}
RULES = {
    "region": None,  # fixed dim: copy once
    "nation": None,  # fixed dim: copy once
    # c_name must carry the SHIFTED key (Customer#<9 digits>): q203's
    # entity resolution matches on the name's digit region, so reusing
    # the replica-0 names would hand every dirty record ~factor true
    # matches at dist<=1 — quadratic OUTPUT growth that no blocking can
    # avoid and real masters don't exhibit (keys are unique).
    "customer": "SELECT c_custkey + {off} AS c_custkey,"
                " 'Customer#' || lpad(CAST(c_custkey + {off} AS VARCHAR), 9, '0')"
                "   AS c_name, c_nationkey,"
                " c_acctbal, c_mktsegment FROM t",
    # s_name carries the shifted key too (Supplier#<9 digits>), same
    # reason as c_name: ScaleOps groups by s_name, and reusing replica-0
    # names would freeze group cardinality while rows per group grow
    # linearly — the exponent would measure the fixture's name collapse.
    "supplier": "SELECT s_suppkey + {off} AS s_suppkey,"
                " 'Supplier#' || lpad(CAST(s_suppkey + {off} AS VARCHAR), 9, '0')"
                "   AS s_name, s_nationkey, s_acctbal FROM t",
    # p_name is free text ('red widget'), not key-derived: salt replicas
    # with a prefix (the documents-text trade) so names stay 1:1 with
    # keys across replicas while within-replica distinctness is preserved.
    "part": "SELECT p_partkey + {off} AS p_partkey,"
            " CASE WHEN {i} = 0 THEN p_name"
            "   ELSE 'r{i} ' || p_name END AS p_name,"
            " p_brand, p_type, p_size, p_retailprice FROM t",
    "orders": "SELECT o_orderkey + {off} AS o_orderkey,"
              " o_custkey + {off} AS o_custkey, o_orderstatus, o_totalprice,"
              " o_orderdate, o_orderpriority FROM t",
    "lineitem": "SELECT l_orderkey + {off} AS l_orderkey,"
                " l_partkey + {off} AS l_partkey,"
                " l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity,"
                " l_extendedprice, l_discount, l_tax, l_returnflag,"
                " l_linestatus, l_shipdate FROM t",
    "events": "SELECT event_id + {off} AS event_id, ts,"
              " user_id + {off} AS user_id, event_type, value, props FROM t",
    "documents": "SELECT doc_id + {off} AS doc_id,"
                 " CASE WHEN {i} = 0 THEN text ELSE"
                 "   'r{i}' || replace(text, ' ', ' r{i}') END AS text,"
                 " lang, source,"
                 " CAST(length(CASE WHEN {i} = 0 THEN text ELSE"
                 "   'r{i}' || replace(text, ' ', ' r{i}') END) AS BIGINT)"
                 "   AS n_chars FROM t",
    "embeddings": "SELECT vec_id + {off} AS vec_id,"
                  " CASE WHEN {i} = 0 THEN embedding ELSE"
                  "   list_concat(embedding[{rot}+1:], embedding[:{rot}])"
                  " END AS embedding, label FROM t",
}


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # rot = (7*i) % 64 is a full cycle only for i < 64 (7 ⊥ 64): replica
    # 64 would rotate by 0 and pile verbatim vector copies into one
    # IVF/LSH cell — exactly the distortion this script exists to avoid.
    # The key shift also feeds lpad(..., 9) names: factor <= 64 keeps
    # every shifted key under 10^9, so the digit-region assumptions of
    # the name-keyed operators (q203's substring window) stay valid.
    if not 2 <= factor <= 64:
        sys.exit(f"factor must be in [2, 64], got {factor}: rotation "
                 "degenerates to verbatim copies at i=64 and 9-digit "
                 "name keys overflow near factor 100")
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, rule in RULES.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS"
            f" SELECT * FROM '{src}/{table}.parquet'")
        if rule is None:
            sql = "SELECT * FROM t"
        else:
            parts = []
            for i in range(factor):
                rot = (7 * i) % 64
                parts.append(rule.format(i=i, off=i * KOFF, rot=rot))
            sql = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
