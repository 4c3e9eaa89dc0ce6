#!/usr/bin/env python3
"""Merge >=3 SEPARATED full-bench runs into one noise-proof snapshot
(dev tool, VERDICT r15 item 1 protocol).

Usage: python3 scripts/bench_snapshot.py out.json [--prev prior_snapshot.json]
       run1.json run2.json ...

With --prev, the snapshot additionally diffs per-query MIN-FLOORS
against the prior committed snapshot and records every query whose
floor rose >20% (and >0.1s absolute) in a `regressions` array — the
VERDICT r16 item 8 ask: the next real regression names itself instead
of hiding in a median. Queries new since the prior snapshot are skipped
(no baseline).

Each input is one graft.Bench BENCH_FULL.json line (per-query medians of
interleaved passes + per-query mins). The snapshot takes, per query, the
MEDIAN across the runs' medians (the headline, comparable to earlier
rounds' medians) and the MIN across the runs' mins (the noise-floor
estimate), and records the cross-run spread so a reader can tell a real
regression from the host's documented +/-12% noise band: trust total_min
movements, discount median movements smaller than cross_run_spread_pct.
"""
import json
import statistics
import sys


def main() -> None:
    out, *ins = sys.argv[1:]
    prev = None
    if ins and ins[0] == "--prev":
        prev = json.loads(open(ins[1]).read().strip().splitlines()[-1])
        ins = ins[2:]
    runs = [json.loads(open(p).read().strip().splitlines()[-1]) for p in ins]
    assert len(runs) >= 3, "need >=3 separated runs"
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        assert set(r["queries"]) == names, "runs must cover the same query set"
    queries, mins = {}, {}
    for q in sorted(names):
        meds = [r["queries"][q] for r in runs]
        queries[q] = round(statistics.median(meds), 3)
        mins[q] = round(min(r.get("query_mins", r["queries"])[q] for r in runs), 3)
    totals = [round(sum(r["queries"].values()), 3) for r in runs]
    total = round(sum(queries.values()), 3)
    total_min = round(sum(mins.values()), 3)
    spread_pct = round(100.0 * (max(totals) - min(totals)) / statistics.median(totals), 2)
    failed = sorted({f for r in runs for f in r.get("failed", [])})
    snap = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "query_mins": mins,
        "failed": failed,
        "sf": runs[0]["sf"],
        "n_queries": len(queries),
        "protocol": (
            f"per-query median across {len(runs)} separated full runs "
            f"(each itself a median of {runs[0].get('repeats', '?')} interleaved passes); "
            "query_mins/total_min = best sample anywhere (noise floor)"
        ),
        "run_totals": totals,
        "cross_run_spread_pct": spread_pct,
        "total_min": total_min,
    }
    if prev is not None:
        prev_mins = prev.get("query_mins", prev.get("queries", {}))
        regressions = [
            {"query": q, "prev_min": prev_mins[q], "min": mins[q],
             "pct": round(100.0 * (mins[q] - prev_mins[q]) / prev_mins[q], 1)}
            for q in sorted(mins) if q in prev_mins and prev_mins[q] > 0
            and mins[q] > prev_mins[q] * 1.2 and mins[q] - prev_mins[q] > 0.1]
        snap["regressions"] = regressions
        baseline_kind = "query_mins" if "query_mins" in prev else "queries (medians — legacy snapshot without mins; floors vs medians UNDERSTATE regressions)"
        snap["regressions_vs"] = (
            f"{prev.get('protocol', 'prior snapshot')} [baseline field: {baseline_kind}]")
    with open(out, "w") as f:
        f.write(json.dumps(snap) + "\n")
    print(f"runs: {totals} -> snapshot {total} (min-floor {total_min}, "
          f"cross-run spread {spread_pct}%) -> {out}")


if __name__ == "__main__":
    main()
