#!/usr/bin/env python3
"""Compute per-family sf0.1 -> sf1 scaling exponents (tooling, not engine
code). Inputs: two Bench detail JSONs (same schema as bench_full_latest
.json) at sf0.1 and sf1. For each query with both timings above a noise
floor, exponent = log10(t_sf1 / t_sf01) -- 1.0 = perfectly linear in the
10x data, 2.0 = quadratic, ~0 = scale-independent. Families are the query
name prefixes. Writes a markdown table for SCALE.md."""
import json, math, sys
from collections import defaultdict

def load(p):
    d = json.load(open(p))
    return {k: v for k, v in d["queries"].items() if v > 0}

def main(sf01_path, sf1_path, noise=0.2):
    a, b = load(sf01_path), load(sf1_path)
    fams = defaultdict(list)
    rows = []
    for q in sorted(a.keys() & b.keys()):
        t0, t1 = a[q], b[q]
        if t0 < noise and t1 < noise:
            fams[q.split("_")[0][0]].append((q, 0.0, t0, t1, True))
            continue
        exp = math.log10(max(t1, 1e-3) / max(t0, 1e-3))
        fams[q.split("_")[0][0]].append((q, exp, t0, t1, False))
        rows.append((q, exp, t0, t1))
    print("| family | n | median exp | p90 exp | worst query | worst exp |")
    print("|---|---|---|---|---|---|")
    for f in sorted(fams):
        es = sorted(e for _, e, _, _, noise_ in fams[f] if not noise_)
        if not es:
            print(f"| {f}* | {len(fams[f])} | (all under noise floor) | | | |")
            continue
        med = es[len(es)//2]
        p90 = es[int(len(es)*0.9)] if len(es) > 1 else es[-1]
        worst = max((x for x in fams[f] if not x[4]), key=lambda x: x[1])
        print(f"| {f}* | {len(fams[f])} | {med:.2f} | {p90:.2f} | "
              f"{worst[0]} ({worst[2]:.2f}s->{worst[3]:.2f}s) | {worst[1]:.2f} |")
    rows.sort(key=lambda r: -r[1])
    print("\nTop superlinear queries (exp > 1.30):")
    for q, e, t0, t1 in rows:
        if e > 1.30:
            print(f"  {q}: {t0:.2f}s -> {t1:.2f}s (exp {e:.2f})")
    both = sorted(a.keys() & b.keys())
    print(f"\n{len(both)} comparable queries; sf0.1 total "
          f"{sum(a[q] for q in both):.1f}s, sf1 total {sum(b[q] for q in both):.1f}s")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
