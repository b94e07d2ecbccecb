#!/usr/bin/env python3
"""Build a copy of a testdata scale dir with events.ts flipped to the
OTHER parquet layout, so the local gate can exercise both layouts the
driver has shipped (VERDICT r7 item 2: the six streaming twins passed
130/130 locally on one layout and went red on the driver's other one).

The two layouts seen across testdata generations:
  A. raw INT64 nanoseconds (parquet TIMESTAMP(NANOS) — Spark reads it
     as LongType under spark.sql.legacy.parquet.nanosAsLong=true)
  B. timestamp[us] (Spark reads TIMESTAMP_NTZ / DuckDB TIMESTAMP)

Every table except events is symlinked; events.parquet is rewritten
with ts cast to whichever layout the source dir does NOT have. Values
are identical (the source data is µs-grained, so ns<->µs is lossless).

Usage: python tools/alt_layout.py <sfDir> <outDir>
Then run the normal gate against <outDir>:
  sbt -batch "runMain graft.Verify <outDir> <verifyOut> [query...]"
  python tools/check.py <outDir> <verifyOut> [query...]
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.lexists(dst):
            os.remove(dst)
        if t != "events":
            os.symlink(os.path.abspath(src), dst)
            continue
        tbl = pq.read_table(src)
        i = tbl.schema.get_field_index("ts")
        ts = tbl.column(i)
        f = tbl.schema.field(i)
        if pa.types.is_timestamp(f.type) and f.type.unit != "ns":
            # layout B -> A: µs timestamps become TIMESTAMP(NANOS);
            # version='2.6' is required or pyarrow silently coerces
            # nanos back down to µs on write
            alt = ts.cast(pa.timestamp("ns", tz=f.type.tz))
            made = "nanos"
        else:
            # layout A -> B: raw int64 nanos (or ns timestamps) become
            # plain timestamp[us]
            if pa.types.is_timestamp(f.type):
                alt = ts.cast(pa.timestamp("us", tz=f.type.tz))
            else:
                alt = ts.cast(pa.int64()).cast(pa.timestamp("ns")) \
                        .cast(pa.timestamp("us"))
            made = "timestamp[us]"
        out = tbl.set_column(i, "ts", alt)
        pq.write_table(out, dst, version="2.6", coerce_timestamps=None)
        print(f"events.ts: {f.type} -> {made} ({out.num_rows} rows) at {dst}")


if __name__ == "__main__":
    main()
