#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only; the
engine itself is pure Scala/Spark). Usage:

  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

Reads each /tmp/verify_out/<name>/ parquet result, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB over the same testdata tables, and
compares row counts, sorted-by-name schemas, and exact values.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    # sort columns by name, then rows by all columns (stringified for mixed types)
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracles.items()):
        res_glob = os.path.join(out_dir, name, "*.parquet")
        files = glob.glob(res_glob)
        if not files:
            print(f"FAIL {name}: no result parquet at {res_glob}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if g.dtypes.tolist() != w.dtypes.tolist():
            print(f"WARN {name}: dtypes {g.dtypes.tolist()} != {w.dtypes.tolist()}")
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        neq = (g.astype(str) != w.astype(str))
        if neq.any().any():
            bad_cols = [c for c in g.columns if neq[c].any()]
            idx = neq.any(axis=1)
            print(f"FAIL {name}: {int(idx.sum())}/{len(g)} rows differ in {bad_cols}")
            print("  got:  ", g[idx].head(3).to_dict("records"))
            print("  want: ", w[idx].head(3).to_dict("records"))
            failures += 1
            continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
