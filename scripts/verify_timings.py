#!/usr/bin/env python3
"""Extract approximate per-query timings from a graft.Verify dump
(tooling, not engine code): Verify runs queries sequentially, so the
delta between consecutive result-directory mtimes is that query's
wall time (dump included). Emits a Bench-detail-shaped JSON so
sf1_scaling.py / bench_compare.py can consume it directly.

Usage: python3 scripts/verify_timings.py OUTDIR SFDIR > timings.json
"""
import json
import os
import sys


def main(outdir, sfdir):
    entries = []
    for name in os.listdir(outdir):
        p = os.path.join(outdir, name)
        if os.path.isdir(p) and not name.startswith(".tmp-"):
            entries.append((os.path.getmtime(p), name))
    entries.sort()
    qs = {}
    prev = None
    for t, name in entries:
        if prev is not None:
            qs[name] = round(t - prev, 3)
        prev = t
    # the first query's start isn't observable from mtimes; drop it
    out = {"metric": "total_detail",
           "value": round(sum(qs.values()), 3),
           "unit": "sec", "mode": "verify-mtime-delta",
           "queries": qs, "sf": sfdir}
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
