#!/usr/bin/env python3
"""Golden checks for the three queries DuckDB cannot oracle
(VERDICT r9 item 4) — pinned against the REFERENCE'S OWN STACK
(SQLite FTS5, tokenize='porter') instead of rows-only:

  f4_porter_stem    — every (token → stem) pair the engine produced
                      must equal what SQLite's porter tokenizer emits
                      for that token (read back via fts5vocab).
  o1_search_porter  — the porter-pipeline top-100 search is pinned to
                      an actual SQLite FTS5 table built from the same
                      search_index rows: every returned key must be in
                      SQLite's porter match set, every score must equal
                      -bm25() rank within float tolerance, and the
                      top-100 must equal SQLite's matched rows sorted
                      by OUR documented total order (round(score,4)
                      DESC, timestamp DESC, type, key). On this fixture
                      scores tie in whole classes (template-generated
                      text), so SQLite's own LIMIT-100 cut is insertion-
                      order noise — the engine's deterministic tie
                      contract is the part that is ours; everything
                      else (match set, scores) is the reference's.
  a6_approx_distinct — HLL sketch values are engine-specific, but the
                      query emits the exact count beside the sketch:
                      assert |approx − exact| / exact <= 15% per group
                      (Spark's HLL++ default rsd is 5%).

Driver-side-tooling tier (same as check.py's duckdb): sqlite3 is the
reference's engine — using it HERE, as an oracle, is exactly the
"generate goldens from the reference's own stack" the verdict asked
for. Nothing in src/ depends on it.

Usage: tools/golden_fts.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import re
import sqlite3
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def search_index_rows(sf_dir, verify_dir):
    """Materialize the oracle's search_index CTE body via DuckDB."""
    with open(os.path.join(verify_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    sql = oracle["o1_search_topk"]
    m = re.search(r"WITH search_index AS \(\n(.*?)\n\),\ndoc_tokens AS",
                  sql, re.S)
    if not m:
        raise SystemExit("golden_fts: could not extract search_index CTE")
    body = m.group(1)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(body).fetchdf()


def check_porter_stems(verify_dir):
    mine = pd.read_parquet(os.path.join(verify_dir, "f4_porter_stem"))
    c = sqlite3.connect(":memory:")
    c.execute("CREATE VIRTUAL TABLE pt USING fts5(x, tokenize='porter')")
    c.execute("CREATE VIRTUAL TABLE ptv USING fts5vocab(pt, 'instance')")
    tokens = list(mine["token"])
    for t in tokens:
        c.execute("INSERT INTO pt VALUES (?)", (t,))
    # fts5vocab 'instance': one row per indexed term occurrence with its
    # rowid — rowid i+1 holds exactly token i, so term@doc IS its stem
    golden = {}
    for term, doc in c.execute("SELECT term, doc FROM ptv"):
        golden.setdefault(doc, []).append(term)
    bad = []
    for i, (tok, stem) in enumerate(zip(mine["token"], mine["stem"])):
        g = golden.get(i + 1, [])
        if len(g) != 1 or g[0] != stem:
            bad.append((tok, stem, g))
    if bad:
        print(f"f4_porter_stem: FAIL — {len(bad)} stems differ from "
              f"SQLite porter, e.g. {bad[:5]}")
        return False
    print(f"f4_porter_stem: OK — {len(tokens)} stems match SQLite FTS5 porter")
    return True


def check_search_porter(sf_dir, verify_dir):
    si = search_index_rows(sf_dir, verify_dir)
    c = sqlite3.connect(":memory:")
    c.execute("""CREATE TABLE search_index (
        type TEXT, key TEXT, title TEXT, timestamp TEXT, category INTEGER,
        is_public INTEGER, search_1 TEXT, search_2 TEXT, search_3 TEXT)""")
    c.executemany(
        "INSERT INTO search_index VALUES (?,?,?,?,?,?,?,?,?)",
        si[["type", "key", "title", "timestamp", "category", "is_public",
            "search_1", "search_2", "search_3"]].itertuples(index=False))
    # the reference's FTS table: enable_fts(["title","search_1"],
    # tokenize="porter") — utils.py:90
    c.execute("""CREATE VIRTUAL TABLE search_index_fts USING fts5(
        title, search_1, content='search_index', content_rowid='rowid',
        tokenize='porter')""")
    c.execute("INSERT INTO search_index_fts(search_index_fts) VALUES ('rebuild')")
    # ALL matched rows with their bm25 rank (the reference's ranking
    # function); the LIMIT-100 cut is applied below under the engine's
    # documented total order, because SQLite's own tie order within an
    # equal-rank class is insertion-order noise, not semantics
    matched = c.execute("""
        SELECT search_index.type, search_index.key, search_index.timestamp,
               -search_index_fts.rank AS score
        FROM search_index JOIN search_index_fts
          ON search_index.rowid = search_index_fts.rowid
        WHERE search_index_fts MATCH 'orders'""").fetchall()
    mine = pd.read_parquet(os.path.join(verify_dir, "o1_search_porter"))
    ok = True
    gmap = {(t, k): (ts, s) for t, k, ts, s in matched}
    mmap = {(t, k): s for t, k, s in
            mine[["type", "key", "score"]].itertuples(index=False)}
    outside = set(mmap) - set(gmap)
    if len(mine) != 100 or outside:
        print(f"o1_search_porter: FAIL — {len(mine)} rows; "
              f"{len(outside)} keys outside SQLite's match set: "
              f"{sorted(outside)[:5]}")
        ok = False
    else:
        worst = max(abs(gmap[k][1] - mmap[k]) for k in mmap)
        if worst > 5e-4:  # scores round to 4 decimals on our side
            offenders = sorted(
                ((abs(gmap[k][1] - mmap[k]), k) for k in mmap), reverse=True)[:5]
            print(f"o1_search_porter: FAIL — max |score − (−rank)| = "
                  f"{worst:.6f} > 5e-4; worst: {offenders}")
            ok = False
        else:
            # golden top-100: SQLite's matched rows under the engine's
            # total order (round(score,4) DESC, timestamp DESC, type, key)
            ordered = sorted(
                ((t, k, ts, s) for (t, k), (ts, s) in gmap.items()),
                key=lambda r: (-round(r[3], 4), _desc_str(r[2]), r[0], r[1]))
            golden_keys = [(t, k) for t, k, _ts, _s in ordered[:100]]
            mine_keys = list(mine[["type", "key"]].itertuples(
                index=False, name=None))
            if mine_keys != golden_keys:
                diffs = [i for i, (a, b) in
                         enumerate(zip(mine_keys, golden_keys)) if a != b]
                print(f"o1_search_porter: FAIL — top-100 differs from "
                      f"SQLite matched rows under the engine tie order; "
                      f"first diffs at {diffs[:5]}: "
                      f"{[(mine_keys[i], golden_keys[i]) for i in diffs[:3]]}")
                ok = False
            else:
                print(f"o1_search_porter: OK — 100 rows ⊆ SQLite porter "
                      f"match set ({len(gmap)} matched), scores == -bm25 "
                      f"(max delta {worst:.2e}), top-100 == golden order")
    return ok


def _desc_str(s):
    """Sort key that orders strings DESCENDING inside an ascending sort.

    The trailing +1 sentinel handles the strict-prefix case (ADVICE
    r10): with bare negated bytes, 'ab' < 'abc' ascending (shorter
    tuple first), but descending order needs the LONGER string first.
    Every negated byte is <= 0, so a shorter string's sentinel (+1)
    compares greater than the longer string's next negated byte, and
    the longer string correctly leads. Equal strings stay equal.
    """
    return tuple(-b for b in s.encode()) + (1,)


def check_search_topk(sf_dir, verify_dir):
    """Bonus pin (beyond the three rows-only queries): the DEFAULT
    pipeline's flagship search, o1_search_topk ('urgent building',
    unicode61), scored against SQLite FTS5's own bm25(). Unlike the
    porter query, this one's idf is NOT clamped (560 matches of ~16k
    docs → idf ≈ 3.3), so score parity here pins the combined-row
    BM25 formula itself to the reference stack, not just the clamp.
    """
    si = search_index_rows(sf_dir, verify_dir)
    c = sqlite3.connect(":memory:")
    c.execute("""CREATE TABLE search_index (
        type TEXT, key TEXT, title TEXT, timestamp TEXT, category INTEGER,
        is_public INTEGER, search_1 TEXT, search_2 TEXT, search_3 TEXT)""")
    c.executemany(
        "INSERT INTO search_index VALUES (?,?,?,?,?,?,?,?,?)",
        si[["type", "key", "title", "timestamp", "category", "is_public",
            "search_1", "search_2", "search_3"]].itertuples(index=False))
    c.execute("""CREATE VIRTUAL TABLE search_index_fts USING fts5(
        title, search_1, content='search_index', content_rowid='rowid')""")
    c.execute("INSERT INTO search_index_fts(search_index_fts) VALUES ('rebuild')")
    matched = c.execute("""
        SELECT search_index.type, search_index.key,
               -search_index_fts.rank AS score
        FROM search_index JOIN search_index_fts
          ON search_index.rowid = search_index_fts.rowid
        WHERE search_index_fts MATCH 'urgent building'""").fetchall()
    gmap = {(t, k): s for t, k, s in matched}
    mine = pd.read_parquet(os.path.join(verify_dir, "o1_search_topk"))
    mmap = {(t, k): s for t, k, s in
            mine[["type", "key", "score"]].itertuples(index=False)}
    outside = set(mmap) - set(gmap)
    if outside:
        print(f"o1_search_topk: FAIL — {len(outside)} keys outside "
              f"SQLite's match set: {sorted(outside)[:5]}")
        return False
    worst = max(abs(gmap[k] - mmap[k]) for k in mmap) if mmap else 0.0
    if worst > 6e-4:
        offenders = sorted(
            ((abs(gmap[k] - mmap[k]), k) for k in mmap), reverse=True)[:5]
        print(f"o1_search_topk: FAIL — max |score − (−rank)| = "
              f"{worst:.6f} > 6e-4 vs SQLite bm25; worst: {offenders}")
        return False
    print(f"o1_search_topk: OK — {len(mine)} rows ⊆ SQLite unicode61 match "
          f"set ({len(gmap)} matched), scores == -bm25 (max delta {worst:.2e})")
    return True


def check_approx_distinct(verify_dir):
    mine = pd.read_parquet(
        os.path.join(verify_dir, "a6_approx_distinct"))
    bad = []
    for flag, approx, exact in mine.itertuples(index=False):
        if exact == 0 or abs(approx - exact) / exact > 0.15:
            bad.append((flag, approx, exact))
    if bad:
        print(f"a6_approx_distinct: FAIL — outside 15% band: {bad}")
        return False
    print(f"a6_approx_distinct: OK — {len(mine)} groups within 15% of exact")
    return True


def main():
    sf_dir, verify_dir = sys.argv[1], sys.argv[2]
    results = [
        check_porter_stems(verify_dir),
        check_search_porter(sf_dir, verify_dir),
        check_search_topk(sf_dir, verify_dir),
        check_approx_distinct(verify_dir),
    ]
    if not all(results):
        sys.exit(1)
    print("golden checks: all three no-oracle queries pinned "
          "(+ flagship bm25 parity)")


if __name__ == "__main__":
    main()
