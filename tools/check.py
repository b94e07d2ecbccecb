#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each query's
parquet dump from Verify, run its oracle SQL in DuckDB over the same
testdata tables, compare columns (sorted by name), row counts, and
values. Usage: python tools/check.py <sfDir> <verifyOutDir> [query...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            mine = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            mine_cols = sorted(mine.columns)
            mine_rows = con.sql(
                f"SELECT {', '.join(repr_col(c) for c in mine_cols)} FROM mine").fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read my output: {e}")
            n_fail += 1
            continue
        try:
            ora = con.sql(sql)
            ora_cols = sorted(ora.columns)
            ora_rows = con.sql(
                f"SELECT {', '.join(repr_col(c) for c in ora_cols)} FROM ora").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if mine_cols != ora_cols:
            print(f"FAIL {name}: columns {mine_cols} != {ora_cols}")
            n_fail += 1
            continue
        if len(mine_rows) != len(ora_rows):
            print(f"FAIL {name}: rows {len(mine_rows)} != {len(ora_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(mine_rows, ora_rows)):
            na, nb = tuple(map(norm, a)), tuple(map(norm, b))
            if na != nb:
                bad = (i, na, nb)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  mine  : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine_rows)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    import os
    for d in sorted(os.listdir(out_dir)):
        if (only and d not in only) or d in oracle or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{out_dir}/{d}/*.parquet')").fetchone()[0]
            print(f"ROWS {d}: {n} rows (no oracle)")
            n_skip += 1
        except Exception as e:
            print(f"FAIL {d}: unreadable rows-only output: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

def repr_col(c):
    return '"' + c.replace('"', '""') + '"'

if __name__ == "__main__":
    main()
