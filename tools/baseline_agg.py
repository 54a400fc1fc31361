#!/usr/bin/env python3
"""Aggregate 8 Bench samples (/tmp/bench_sample_N.json) into the
BASELINE.md per-query p50/p90/min table. Prints the table body and
summary numbers; BASELINE.md prose is edited by hand around it."""
import json
import statistics
import sys

samples = []
for i in range(1, 9):
    with open(f"/tmp/bench_sample_{i}.json") as f:
        samples.append(json.load(f))

# A budget-truncated sample must never flow into the record silently:
# a query present in sample 1 but missing from a truncated later
# sample crashes below with KeyError, and a truncated sample 1 would
# silently shrink the query set and deflate p50_sum. Same for the
# degraded single-run mode — those times include codegen compile and
# are not p50-comparable.
bad = [i + 1 for i, s in enumerate(samples)
       if s.get("timed_out") or s.get("skipped", 0) > 0 or s.get("partial")]
if bad:
    sys.exit(f"!! samples {bad} are truncated (timed_out/skipped/partial) — "
             "re-record them on a quiet box; refusing to aggregate")
degraded = [i + 1 for i, s in enumerate(samples) if s.get("single_run")]
if degraded:
    sys.exit(f"!! samples {degraded} degraded to single-run under load "
             "(times include codegen compile) — re-record; refusing to aggregate")
keysets = [frozenset(s["queries"].keys()) for s in samples]
if len(set(keysets)) != 1:
    diff = set().union(*keysets) - set.intersection(*map(set, keysets))
    sys.exit(f"!! samples disagree on the query set (e.g. {sorted(diff)[:5]}) — "
             "mixed-HEAD samples; refusing to aggregate")

queries = sorted(samples[0]["queries"].keys())
totals = [sum(v for v in s["queries"].values() if v >= 0) for s in samples]
fails = [sum(1 for v in s["queries"].values() if v < 0) for s in samples]
loads = [s.get("load1", -1) for s in samples]
warms = [s.get("warmup_s", -1) for s in samples]

rows = []
p50_sum = p90_sum = min_sum = 0.0
for q in queries:
    vals = sorted(s["queries"][q] for s in samples)
    if any(v < 0 for v in vals):
        print(f"!! {q} failed in some sample", file=sys.stderr)
        continue
    p50 = statistics.median(vals)
    p90 = vals[int(0.9 * (len(vals) - 1))]
    mn = vals[0]
    p50_sum += p50
    p90_sum += p90
    min_sum += mn
    rows.append((q, p50, p90, mn))

print(f"samples totals: {', '.join(f'{t:.1f}' for t in totals)} s "
      f"(fails per run: {fails})")
print(f"load1 range: {min(loads):.1f}-{max(loads):.1f}; "
      f"warmup_s range: {min(warms):.2f}-{max(warms):.2f}")
print(f"n_queries={len(rows)} p50_sum={p50_sum:.1f} p90_sum={p90_sum:.1f} "
      f"min_sum={min_sum:.1f}")
print()
print("| query | p50 | p90 | min |")
print("| --- | --- | --- | --- |")
for q, p50, p90, mn in rows:
    print(f"| {q} | {p50:.3f} | {p90:.3f} | {mn:.3f} |")
