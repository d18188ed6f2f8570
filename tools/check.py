#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

usage: tools/check.py SF_DIR VERIFY_OUT_DIR [key ...]

For each key in VERIFY_OUT_DIR/oracle_sql.json (or just the keys given):
run the oracle SQL in DuckDB over the SF_DIR parquet tables, read the
Spark result parquet, sort columns by name on both sides, and compare
exactly (schema + values + row order). Prints PASS/FAIL per key.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # normalize value for comparison: floats exact, arrays to tuples
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols2 = [cols[i] for i in order]
    rows2 = [tuple(norm(r[i]) for i in order) for r in rows]
    return cols2, rows2

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        spark_glob = glob.glob(os.path.join(out_dir, key, "*.parquet"))
        if not spark_glob:
            print(f"FAIL {key}: no spark output")
            n_fail += 1
            continue
        try:
            ocols, orows = fetch(con, oracle[key])
        except Exception as e:
            print(f"FAIL {key}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scols, srows = fetch(
                con, f"SELECT * FROM read_parquet('{os.path.join(out_dir, key)}/*.parquet')")
        except Exception as e:
            print(f"FAIL {key}: spark read error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {key}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {key}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {key}: {len(bad)}/{len(srows)} rows differ; first row {i}:")
            print(f"      cols   {ocols}")
            print(f"      spark  {a}")
            print(f"      oracle {b}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
