#!/usr/bin/env python3
"""Per-query bench history folder (VERDICT r13 item 6): folds every
committed lineage *final* cut into BENCH_HISTORY.json keyed

    query -> scale -> round -> seconds

so round-over-round movers are COMPUTED, not eyeballed. The three-
artifact same-day chain decides code-vs-host for a given mover; this
history decides WHICH queries are movers worth chaining. Exhibits
(non-numeric final suffixes like `_firstcut`) are excluded — they
document transients, they are not the lineage. When a round committed
several lineage finals (final / final2 / final3), the highest-numbered
one wins, matching the baseline choice in artifact_check.py.

Usage: tools/bench_history.py [--write]
  default: prints the top movers of the newest round vs the round before
  --write: also rewrites BENCH_HISTORY.json from the committed cuts

Scales are reported as the basename of the cut's "sf" regime field
(sf0.1, sf1, ...). Setup entries are folded under "setup:<name>" keys so
build-cost drift is tracked on the same axis.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from artifact_check import parse_final  # noqa: E402


def load_finals():
    import glob
    # (query_or_setup, scale, round) -> seconds; lineage finals only
    best = {}  # (family, round) -> (seq, name)
    for name in glob.glob("BENCH_*.json"):
        p = parse_final(name)
        if not p or not p[2]:
            continue
        fam, rnd, _, seq = p
        k = (fam, rnd)
        if k not in best or seq > best[k][0]:
            best[k] = (seq, name)
    hist = {}
    for (fam, rnd), (_, name) in sorted(best.items()):
        with open(name) as f:
            obj = json.load(f)
        scale = os.path.basename(str(obj.get("sf", ""))) or fam.lower()
        for q, t in obj.get("queries", {}).items():
            hist.setdefault(q, {}).setdefault(scale, {})[str(rnd)] = round(t, 3)
        for q, t in obj.get("setup", {}).items():
            hist.setdefault("setup:" + q, {}).setdefault(scale, {})[str(rnd)] = round(t, 3)
    return hist


def movers(hist, top=15):
    rounds = sorted({int(r) for q in hist.values()
                     for sc in q.values() for r in sc}, reverse=True)
    if len(rounds) < 2:
        return []
    cur, prev = str(rounds[0]), str(rounds[1])
    out = []
    for q, scales in hist.items():
        for sc, byr in scales.items():
            if cur in byr and prev in byr and byr[prev] >= 0.3:
                out.append((byr[cur] / byr[prev], q, sc, byr[prev], byr[cur]))
    out.sort(reverse=True)
    return [(q, sc, a, b, r) for r, q, sc, a, b in out[:top]], cur, prev


def main():
    hist = load_finals()
    if "--write" in sys.argv:
        with open("BENCH_HISTORY.json", "w") as f:
            json.dump(hist, f, indent=1, sort_keys=True)
        n_pts = sum(len(byr) for q in hist.values() for byr in q.values())
        print(f"BENCH_HISTORY.json: {len(hist)} series, {n_pts} points")
    m = movers(hist)
    if m:
        rows, cur, prev = m
        print(f"top movers r{prev} -> r{cur} (prev >= 0.3s):")
        for q, sc, a, b, r in rows:
            print(f"  {q} [{sc}]: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")


if __name__ == "__main__":
    main()
