#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each query's
parquet dump from Verify, run its oracle SQL in DuckDB over the same
testdata tables, compare columns (sorted by name), row counts, and
values. Usage: python tools/check.py [--dump] <sfDir> <verifyOutDir> [query...]

--dump (or any FAIL) writes canonical CSVs to <verifyOutDir>/_dump/:
<name>.mine.csv + <name>.oracle.csv — columns sorted by name, rows
sorted lexicographically, doubles as raw IEEE-754 bit hex. The format
is byte-identical to Verify's own <verifyOutDir>/_csv/<name>.csv, so a
driver-vs-local disagreement leaves a three-way diffable trail
(driver engine rows vs local engine rows vs local oracle rows) instead
of a bare hash boolean.
"""
import json, math, os, struct, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return v

def fmt_val(v):
    """Canonical cross-engine value repr (mirror of Verify.fmtVal)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return "0x" + struct.pack(">d", v).hex()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, str):
        return (v.replace("\\", "\\\\").replace("\t", "\\t")
                 .replace("\n", "\\n").replace("\r", "\\r"))
    if isinstance(v, list):
        return "[" + ",".join(fmt_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(sorted(f"{fmt_val(k)}:{fmt_val(x)}"
                                     for k, x in v.items())) + "}"
    import datetime, re
    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S.%f")
        return re.sub(r"(\.\d*?)0+$", r"\1", s).rstrip(".")
    return str(v)

def dump_rows(path, cols, rows):
    lines = sorted("\t".join(fmt_val(v) for v in r) for r in rows)
    with open(path, "w") as f:
        f.write("\t".join(cols) + "\n")
        for ln in lines:
            f.write(ln + "\n")

def main():
    args = [a for a in sys.argv[1:] if a != "--dump"]
    dump_all = "--dump" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    dump_dir = f"{out_dir}/_dump"
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
        failed = None
        if mine_cols != ora_cols:
            failed = f"columns {mine_cols} != {ora_cols}"
        elif len(mine_rows) != len(ora_rows):
            failed = f"rows {len(mine_rows)} != {len(ora_rows)}"
        else:
            for i, (a, b) in enumerate(zip(mine_rows, ora_rows)):
                na, nb = tuple(map(norm, a)), tuple(map(norm, b))
                if na != nb:
                    failed = f"row {i}:\n  mine  : {na}\n  oracle: {nb}"
                    break
        if dump_all or failed:
            os.makedirs(dump_dir, exist_ok=True)
            dump_rows(f"{dump_dir}/{name}.mine.csv", mine_cols, mine_rows)
            dump_rows(f"{dump_dir}/{name}.oracle.csv", ora_cols, ora_rows)
        if failed:
            print(f"FAIL {name}: {failed}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine_rows)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    for d in sorted(os.listdir(out_dir)):
        if (only and d not in only) or d in oracle or not os.path.isdir(f"{out_dir}/{d}") \
                or d.startswith("_"):
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
