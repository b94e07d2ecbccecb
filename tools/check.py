#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each query's
parquet dump from Verify, run its oracle SQL in DuckDB over the same
testdata tables, compare columns (sorted by name), row counts, and
values. Usage: python tools/check.py [--dump] <sfDir> <verifyOutDir> [query...]

Strictness contract (VERDICT r5 item 6): this gate must be AT LEAST as
strict as the driver's comparator — three rounds were lost to queries
that passed here and failed there. Concretely:
  1. every oracle query's parquet is ALSO loaded through the driver's
     own path (pandas read_parquet → sort_values over all columns) —
     if that crashes (e.g. ndarray cells from an array column), the
     query FAILS here even if the DuckDB compare would pass;
  2. nested (list/struct/map) output columns in oracle-checked queries
     are rejected outright (SURVEY §8: declared queries emit scalar
     columns only);
  3. rows are compared SORTED (by canonical value repr), like the
     driver, not in declared-ORDER-BY order — a non-total ORDER BY
     then cannot pass locally by luck of matching tie order.

--dump (or any FAIL) writes canonical CSVs to <verifyOutDir>/_dump/:
<name>.mine.csv + <name>.oracle.csv — columns sorted by name, rows
sorted lexicographically, doubles as raw IEEE-754 bit hex. The format
is byte-identical to Verify's own <verifyOutDir>_csv/<name>.csv (a
SIBLING dir — anything inside outDir reads as a query to the driver),
so a driver-vs-local disagreement leaves a three-way diffable trail
(driver engine rows vs local engine rows vs local oracle rows) instead
of a bare hash boolean.
"""
import glob, json, math, os, struct, sys
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

def row_key(r):
    return tuple(fmt_val(v) for v in r)

def dump_rows(path, cols, rows):
    lines = sorted("\t".join(fmt_val(v) for v in r) for r in rows)
    with open(path, "w") as f:
        f.write("\t".join(cols) + "\n")
        for ln in lines:
            f.write(ln + "\n")

def driver_path_check(parquet_dir):
    """Replicate the DRIVER's load path: pandas + sort_values over every
    column. Returns an error string if the driver would crash (r5:
    TypeError on ndarray cells), else None. Also rejects nested parquet
    types outright — even where pandas happens to cope, the driver's
    hash of object cells is not trustworthy cross-engine."""
    import pyarrow.dataset as ds
    import pyarrow as pa
    schema = ds.dataset(parquet_dir).schema
    nested = [f"{n}: {schema.field(n).type}" for n in schema.names
              if pa.types.is_nested(schema.field(n).type)]
    if nested:
        return f"nested output column(s) {nested} (SURVEY §8: scalars only)"
    try:
        import pandas as pd
        df = pd.read_parquet(parquet_dir)
        cols = sorted(df.columns)
        df[cols].sort_values(by=cols, kind="mergesort")
    except Exception as e:
        return f"driver comparator would crash: {type(e).__name__}: {e}"
    return None

def main():
    args = [a for a in sys.argv[1:] if a != "--dump"]
    dump_all = "--dump" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    dump_dir = f"{out_dir}/_dump"
    # Resource knobs for big-scale gate runs (the sf1 oracles for the
    # quadratic-shaped sim queries spill tens of GB): GRAFT_DUCKDB_MEM,
    # GRAFT_DUCKDB_THREADS, GRAFT_DUCKDB_TMP.
    cfg = {}
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        cfg["memory_limit"] = os.environ["GRAFT_DUCKDB_MEM"]
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        cfg["threads"] = int(os.environ["GRAFT_DUCKDB_THREADS"])
    con = duckdb.connect(config=cfg)
    if os.environ.get("GRAFT_DUCKDB_TMP"):
        con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TMP']}'")
    if os.environ.get("GRAFT_DUCKDB_TMP_MAX"):
        # Cap spill so a runaway oracle (the sf1 semantic-dedup recursive
        # CTE needs >76 GB) fails its own query instead of filling the disk.
        con.execute(
            f"SET max_temp_directory_size='{os.environ['GRAFT_DUCKDB_TMP_MAX']}'")
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
        drv_err = driver_path_check(f"{out_dir}/{name}")
        if drv_err:
            print(f"FAIL {name}: {drv_err}")
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
            # compare rows SORTED by canonical repr — the driver sorts
            # before hashing, so declared ORDER BY must not be load-bearing
            mine_sorted = sorted(mine_rows, key=row_key)
            ora_sorted = sorted(ora_rows, key=row_key)
            for i, (a, b) in enumerate(zip(mine_sorted, ora_sorted)):
                na, nb = tuple(map(norm, a)), tuple(map(norm, b))
                if na != nb:
                    failed = f"row {i} (sorted):\n  mine  : {na}\n  oracle: {nb}"
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
