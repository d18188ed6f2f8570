#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

usage: tools/check.py SF_DIR VERIFY_OUT_DIR [key ...]
       tools/check.py --lint SF_DIR VERIFY_OUT_DIR

For each key in VERIFY_OUT_DIR/oracle_sql.json (or just the keys given):
run the oracle SQL in DuckDB over the SF_DIR parquet tables, read the
Spark result parquet, sort columns by name on both sides, and compare
exactly (schema + values + row order). Prints PASS/FAIL per key.

TYPE LINT (r17, mandated by the r16 verdict): the DRIVER's hash is
TYPE-sensitive while the value compare below is not. DuckDB widens
SUM(BIGINT) — including window SUM — to HUGEINT (Arrow decimal128(38,0)),
which hash-mismatches Spark's int64 even when every value is equal; this
cost rounds 15-16 as a phantom "flaky witness". So every key now also
binds its oracle SQL and FAILS if any output column types HUGEINT /
UHUGEINT / DECIMAL — oracles must CAST sums to BIGINT/DOUBLE explicitly.
`--lint` mode runs ONLY the type check over every oracle (bind-only, no
execution, no Spark outputs needed) — run it over all keys at round close.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB types whose Arrow surface can never hash-match a Spark column:
# HUGEINT/UHUGEINT -> decimal128(38,0); any DECIMAL vs Spark's int64/double.
# Oracles must cast to the BIGINT/DOUBLE/VARCHAR/BOOL/DATE/TIMESTAMP family.
def banned_types(types):
    bad = []
    for c, t in types:
        u = str(t).upper()
        if "HUGEINT" in u or u.startswith("DECIMAL"):
            bad.append((c, str(t)))
    return bad

def norm(v):
    # normalize value for comparison: floats exact, arrays to tuples
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def fetch(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = list(rel.types)
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols2 = [cols[i] for i in order]
    types2 = [(cols[i], types[i]) for i in order]
    rows2 = [tuple(norm(r[i]) for i in order) for r in rows]
    return cols2, types2, rows2

def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def lint(con, oracle, only=()):
    """Bind every oracle (no execution) and fail on driver-hash-fatal types."""
    n_bad = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        try:
            rel = con.sql(oracle[key])
            bad = banned_types(zip(rel.columns, rel.types))
        except Exception as e:
            print(f"LINTFAIL {key}: oracle bind error: {e}")
            n_bad += 1
            continue
        if bad:
            print(f"LINTFAIL {key}: driver-hash-fatal oracle column types: "
                  + ", ".join(f"{c}::{t}" for c, t in bad)
                  + "  (CAST to BIGINT/DOUBLE in the oracle SQL)")
            n_bad += 1
    print(f"== type lint: {len(oracle) if not only else len(only)} oracles, "
          f"{n_bad} fatal ==")
    return n_bad

def main():
    args = sys.argv[1:]
    lint_only = args and args[0] == "--lint"
    if lint_only:
        args = args[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = connect(sf_dir)
    if lint_only:
        sys.exit(1 if lint(con, oracle, only) else 0)
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
            ocols, otypes, orows = fetch(con, oracle[key])
        except Exception as e:
            print(f"FAIL {key}: oracle error: {e}")
            n_fail += 1
            continue
        bad = banned_types(otypes)
        if bad:
            print(f"FAIL {key}: driver-hash-fatal oracle column types: "
                  + ", ".join(f"{c}::{t}" for c, t in bad))
            n_fail += 1
            continue
        try:
            scols, _, srows = fetch(
                con,
                "SELECT * FROM read_parquet("
                f"'{os.path.join(out_dir, key)}/*.parquet')")
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
