#!/usr/bin/env python3
"""Compare two Bench detail JSONs query-by-query (tooling, not engine
code). Reports the common-set totals, the distribution of per-query
ratios, and the named outliers — the round-13 drift-bisect instrument:
run the current tree's bench in a clean session, diff against the pinned
r11 (or any prior) detail file, and read whether a drift is uniform
(session/JVM pressure) or concentrated (a plan regression).

Usage: python3 scripts/bench_compare.py OLD.json NEW.json [ratio_floor]
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return {k: v for k, v in d["queries"].items() if v > 0}


def main(old_path, new_path, floor=2.0):
    a, b = load(old_path), load(new_path)
    common = sorted(a.keys() & b.keys())
    ta = sum(a[q] for q in common)
    tb = sum(b[q] for q in common)
    print(f"common queries: {len(common)}")
    print(f"old total {ta:.1f}s  new total {tb:.1f}s  ratio {tb / ta:.3f}")
    ratios = sorted((b[q] / a[q], q) for q in common if a[q] > 0.05)
    if ratios:
        n = len(ratios)
        print(f"per-query ratio (old>50ms, n={n}): "
              f"p10 {ratios[n // 10][0]:.2f}  median {ratios[n // 2][0]:.2f}  "
              f"p90 {ratios[9 * n // 10][0]:.2f}")
    print(f"\nqueries above {floor}x (old>0.2s):")
    for r, q in sorted(ratios, reverse=True):
        if r >= floor and a[q] > 0.2:
            print(f"  {q}: {a[q]:.2f}s -> {b[q]:.2f}s ({r:.2f}x)")
    only_new = sorted(set(b) - set(a))
    if only_new:
        print(f"\n{len(only_new)} queries only in NEW "
              f"(sum {sum(b[q] for q in only_new):.1f}s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 2.0)
