#!/usr/bin/env python3
"""Diff two bench.json files' canary-normalized per-query ratios and print
the movers, so round-over-round regressions are a table lookup instead of
a per-query plan-identity argument (r16 VERDICT #6).

  python3 tools/norm_diff.py <old_bench.json> <new_bench.json> [threshold]

Uses queries_norm (canary-normalized) when both files carry it, falling
back to raw queries seconds (flagged, since raw seconds swing with host
load). Threshold is the ratio that counts as a mover (default 1.2).
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if isinstance(d.get("parsed"), dict):  # driver BENCH_r*.json wrapper
        d = d["parsed"]
    return d


def host_noise(d):
    """Queries whose median wall is >3x their min(wall_runs): the median
    was contention-inflated, so a SLOWER verdict on them is host noise
    until the breakdown (byte-identical stages/shuffle) says otherwise
    (r17 VERDICT #6 — adjudicable from the JSON alone)."""
    med, mn = d.get("queries", {}), d.get("queries_min", {})
    return {q for q in set(med) & set(mn)
            if mn[q] > 0 and med[q] / mn[q] > 3.0}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    key = "queries_norm" if old.get("queries_norm") and new.get("queries_norm") \
        else "queries"
    if key == "queries":
        print("WARNING: queries_norm missing in one side; diffing RAW seconds "
              "(host-load sensitive)")
    noisy = host_noise(old) | host_noise(new)
    a, b = old.get(key, {}), new.get(key, {})
    movers = []
    for q in sorted(set(a) & set(b)):
        if a[q] <= 0:
            continue
        r = b[q] / a[q]
        if r > thr or r < 1 / thr:
            movers.append((r, q, a[q], b[q]))
    movers.sort(reverse=True)
    print(f"{len(set(a) & set(b))} common queries ({key}); "
          f"{len(set(b) - set(a))} new, {len(set(a) - set(b))} removed; "
          f"movers beyond {thr}x:")
    for r, q, va, vb in movers:
        flag = "  [HOST NOISE? median>3x min]" if q in noisy else ""
        print(f"  {'SLOWER' if r > 1 else 'faster'} {r:6.2f}x  {q}: "
              f"{va:.3f} -> {vb:.3f}{flag}")
    if not movers:
        print("  (none)")
    for q in sorted(set(b) - set(a)):
        print(f"  NEW              {q}: {b[q]:.3f}")
    if noisy:
        print(f"{len(noisy)} queries with median>3x min in one side "
              f"(contended medians): {', '.join(sorted(noisy))}")


if __name__ == "__main__":
    main()
