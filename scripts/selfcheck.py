#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
shipped Scala library never uses this).

Usage: scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, and compares: schema (column names sorted), row count, and exact
values (columns sorted by name). Strict equality — if this passes, any
reasonable driver tolerance passes too.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize only what the driver's hash also normalizes: timestamps
    # -> ns, integer WIDTHS -> int64 (the r1 gate accepted Spark int32 vs
    # DuckDB int64). int <-> float stays a mismatch (q37 r1 lesson:
    # DuckDB HUGEINT arrives as float64 and the driver flags it).
    for c in df.columns:
        if str(df[c].dtype).startswith('datetime64'):
            df[c] = pd.to_datetime(df[c]).astype('datetime64[ns]')
        elif pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype('int64')
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    for t in ['region','nation','customer','supplier','part','orders',
              'lineitem','events','documents','embeddings']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, '*.parquet'))
        if not files:
            results[name] = 'NO_OUTPUT'
            continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        if name not in oracles:
            results[name] = f'ROWS_ONLY({len(got)})'
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            results[name] = f'ORACLE_SQL_ERROR: {e}'
            continue
        if list(got.columns) != list(exp.columns):
            results[name] = f'SCHEMA_MISMATCH got={list(got.columns)} exp={list(exp.columns)}'
        elif len(got) != len(exp):
            results[name] = f'ROWCOUNT got={len(got)} exp={len(exp)}'
        elif [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            # dtype gate FIRST, unconditionally (mirrors the driver's
            # dtype-sensitive hash — q37 r1 lesson). Checking it before
            # any value comparison means no tolerance fallback can ever
            # mask a dtype difference.
            results[name] = (f'DTYPE_MISMATCH got={[str(t) for t in got.dtypes]} '
                             f'exp={[str(t) for t in exp.dtypes]}')
        else:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                              check_exact=True)
                results[name] = f'OK({len(got)})'
            except AssertionError as e:
                # severity triage only — the driver hashes EXACT values,
                # so a within-rtol diff still fails there and must fail
                # here (no OK_APPROX escape hatch).
                try:
                    pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                                  check_exact=False, rtol=1e-9)
                    results[name] = ('APPROX_DIFF (within 1e-9, but the driver '
                                     'hash is exact): '
                                     + str(e).splitlines()[-1][:200])
                except AssertionError:
                    results[name] = 'VALUES_MISMATCH: ' + ' | '.join(
                        str(e).splitlines()[:6])[:400]
    fails = 0
    for name in sorted(results):
        r = results[name]
        ok = r.startswith('OK') or r.startswith('ROWS_ONLY')
        if not r.startswith('OK('):
            fails += 0 if ok else 1
        print(('PASS ' if ok else 'FAIL '), name, ':', r)
    print(f"== {len(results)} queries, {fails} hard failures ==")
    sys.exit(1 if fails else 0)

if __name__ == '__main__':
    main()
