#!/usr/bin/env python3
"""Scale a testdata dir by an integer factor (default 10): replicate
every table F times with disjoint key offsets, preserving the parquet
schemas EXACTLY (including events.ts's nanosecond timestamps and
embeddings' list<float>, which Spark cannot write back byte-identically
— hence pyarrow here, same driver-side-tooling tier as check.py).

Replicas are decorrelated so the scaled corpus keeps the base corpus'
per-row statistics instead of manufacturing cross-replica artifacts:

 - documents: replica i > 0 appends a ' r<i>' suffix to text (and
   recomputes n_chars), so exact/near-dup rates scale linearly instead
   of every doc gaining 9 exact copies (pairs would grow F^2).
 - embeddings: replica i rotates the vector by i positions — norm and
   component distribution are preserved exactly while cosine against
   the original is ~random, so ANN/near-dup structure scales instead
   of exploding.
 - referential keys shift consistently (orders.o_custkey moves with
   customer.c_custkey, lineitem with orders/part/supplier).
 - the embeddings offset is a multiple of Corpus.IvfSampleEvery (40)
   so the IVF centroid sampling rate is scale-invariant.

Usage: python tools/scale_gen.py <srcDir> <outDir> [factor]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC, OUT = sys.argv[1], sys.argv[2]
F = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key offsets: clean round numbers above every base max key; the
# embeddings offset must divide by 40 (IVF sampling), all others just
# need replica-disjointness
OFF = dict(custkey=1_000_000, orderkey=10_000_000, partkey=1_000_000,
           suppkey=1_000_000, event_id=10_000_000, user_id=1_000_000,
           doc_id=1_000_000, vec_id=1_000_000)

import os
os.makedirs(OUT, exist_ok=True)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def write(t, table, schema):
    table = table.cast(schema)
    # Row-group layout matters as much as row count: Spark's scan
    # parallelism is bounded by row groups (a file split below a group
    # boundary yields empty tasks), and pyarrow's default writes these
    # tables as ONE group — which serialized every documents/events
    # scan onto a single core at sf1 and made the CPU-kernel family
    # (winnow, langid, quality screens) measure the fixture, not the
    # engine. Real 100 TB inputs are multi-group by construction; give
    # the fixture the same property: ~32 groups per table (one per
    # local core), never below 1024 rows per group.
    rg = max(1024, table.num_rows // 32)
    pq.write_table(table, f"{OUT}/{t}.parquet", row_group_size=rg)
    print(f"{t}: {table.num_rows} rows (row_group_size={rg})")


def shifted(table, shifts, i, extra=None):
    """One replica: add i*OFF[k] to the named int columns."""
    cols = {}
    for name in table.schema.names:
        col = table.column(name)
        if name in shifts:
            cols[name] = pc.add(col, i * OFF[shifts[name]])
        else:
            cols[name] = col
    if extra:
        cols = extra(cols, i)
    return pa.table(cols)


def scale(t, shifts, extra=None):
    base = read(t)
    reps = [shifted(base, shifts, i, extra) for i in range(F)]
    write(t, pa.concat_tables(reps), base.schema)


# fixed dims: copy unchanged
for t in ["region", "nation"]:
    write(t, read(t), read(t).schema)

scale("customer", {"c_custkey": "custkey"})
scale("supplier", {"s_suppkey": "suppkey"})
scale("part", {"p_partkey": "partkey"})
scale("orders", {"o_orderkey": "orderkey", "o_custkey": "custkey"})
scale("lineitem", {"l_orderkey": "orderkey", "l_partkey": "partkey",
                   "l_suppkey": "suppkey"})
scale("events", {"event_id": "event_id", "user_id": "user_id"})


def doc_extra(cols, i):
    if i > 0:
        cols["text"] = pc.binary_join_element_wise(
            cols["text"].cast(pa.string()), pa.scalar(f" r{i}"), "")
    cols["n_chars"] = pc.utf8_length(cols["text"]).cast(pa.int64())
    return cols


scale("documents", {"doc_id": "doc_id"}, doc_extra)


def emb_extra(cols, i):
    if i > 0:
        # rotate each vector left by i: norm-preserving decorrelation
        arrs = cols["embedding"].to_pylist()
        rot = [v[i % len(v):] + v[:i % len(v)] if v else v for v in arrs]
        cols["embedding"] = pa.array(rot, type=pa.list_(pa.float32()))
    return cols


scale("embeddings", {"vec_id": "vec_id"}, emb_extra)
print("done:", OUT)
