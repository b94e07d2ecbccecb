#!/usr/bin/env python3
"""Join two Bench JSONs (e.g. sf0.1 vs sf1) into a per-entry scaling
table for PLANS_r{N}. Flags entries whose ratio exceeds the
super-linear threshold (data factor * slack).

Usage: python tools/scaling_table.py <base.json> <scaled.json> [factor] [slack]
"""
import json
import sys

base = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
thresh = factor * slack

rows = []
for name, t0 in {**base["setup"], **base["queries"]}.items():
    kind = "setup" if name in base["setup"] else "query"
    t1 = {**big.get("setup", {}), **big.get("queries", {})}.get(name)
    if t1 is None:
        rows.append((name, kind, t0, None, None, "MISSING AT SCALE"))
        continue
    ratio = t1 / t0 if t0 > 0 else float("inf")
    flag = f"SUPER-LINEAR (> {thresh:.0f}x)" if ratio > thresh else ""
    rows.append((name, kind, t0, t1, ratio, flag))

rows.sort(key=lambda r: -(r[4] or 0))
print(f"| entry | kind | sf0.1 s | sf1 s | ratio ({factor:.0f}x data) | flag |")
print("|---|---|---|---|---|---|")
for name, kind, t0, t1, ratio, flag in rows:
    t1s = f"{t1:.3f}" if t1 is not None else "—"
    rs = f"{ratio:.2f}x" if ratio is not None else "—"
    print(f"| {name} | {kind} | {t0:.3f} | {t1s} | {rs} | {flag} |")

flagged = [r for r in rows if r[5]]
qr = [r for r in rows if r[1] == "query" and r[4] is not None]
import statistics
print()
print(f"entries: {len(rows)}; flagged: {len(flagged)}; "
      f"median query ratio: {statistics.median(r[4] for r in qr):.2f}x; "
      f"total query time: {sum(r[2] for r in qr):.1f}s -> "
      f"{sum(r[3] for r in qr):.1f}s")
