#!/usr/bin/env python3
"""Artifact-integrity guard (VERDICT r9 item 3): every committed
BENCH_*/CORRECTNESS_* JSON at HEAD must be non-empty and parsable,
and BENCH files must carry a non-empty "queries" map. Round 9
snapshotted a 0-byte BENCH_LOCAL_r9.json — this check exists so that
class of truncation fails the gate instead of reaching the judge.

Usage: tools/artifact_check.py [--head]
  default: checks the working-tree files
  --head:  checks the blobs as committed at HEAD (what the judge sees)
"""
import json
import subprocess
import sys


def blobs_at_head():
    names = subprocess.check_output(
        ["git", "ls-tree", "--name-only", "HEAD"], text=True).split()
    for n in names:
        if (n.startswith("BENCH_") or n.startswith("CORRECTNESS_")) and n.endswith(".json"):
            data = subprocess.check_output(["git", "show", f"HEAD:{n}"])
            yield n, data


def files_in_tree():
    import glob
    for n in sorted(glob.glob("BENCH_*.json") + glob.glob("CORRECTNESS_*.json")):
        with open(n, "rb") as f:
            yield n, f.read()


def main():
    src = blobs_at_head if "--head" in sys.argv else files_in_tree
    bad = []
    n_checked = 0
    for name, data in src():
        n_checked += 1
        if not data.strip():
            bad.append(f"{name}: EMPTY (0 bytes or whitespace)")
            continue
        try:
            obj = json.loads(data)
        except Exception as e:
            bad.append(f"{name}: unparsable JSON ({e})")
            continue
        if name.startswith("BENCH_"):
            if "rc" in obj:  # driver-written wrapper format
                if obj.get("rc") != 0:
                    bad.append(f"{name}: driver bench rc={obj.get('rc')}")
            else:  # local graft.Bench one-line format
                q = obj.get("queries")
                if not isinstance(q, dict) or not q:
                    bad.append(f"{name}: no non-empty 'queries' map")
                err = obj.get("errors")
                if isinstance(err, list) and err:
                    bad.append(f"{name}: bench recorded errors: {err}")
        else:  # CORRECTNESS_
            if not isinstance(obj, dict) or not obj:
                bad.append(f"{name}: empty correctness map")
    if bad:
        print("ARTIFACT CHECK FAILED:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"artifact check: {n_checked} files OK")


if __name__ == "__main__":
    main()
