#!/usr/bin/env python3
"""Artifact-integrity guard (VERDICT r9 item 3): every committed
BENCH_*/CORRECTNESS_* JSON at HEAD must be non-empty and parsable,
and BENCH files must carry a non-empty "queries" map. Round 9
snapshotted a 0-byte BENCH_LOCAL_r9.json — this check exists so that
class of truncation fails the gate instead of reaching the judge.

Also (VERDICT r10 item 2): evidence prose must cite artifacts the gate
can resolve — every `BENCH_*.json` / `CORRECTNESS_*.json` filename
mentioned in any PLANS_r*.md / NOTES_r*.md must exist as a committed
file. Round 10's quiet-host numbers lived only in prose; under this
rule a cited cut that was never committed fails the gate. (Numbers
with no named artifact can't be machine-checked — the writing
convention is: name the JSON next to the number.)

Usage: tools/artifact_check.py [--head]
  default: checks the working-tree files
  --head:  checks the blobs as committed at HEAD (what the judge sees)
"""
import json
import re
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
    bench_objs = {}
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
                bench_objs[name] = obj
                q = obj.get("queries")
                if not isinstance(q, dict) or not q:
                    bad.append(f"{name}: no non-empty 'queries' map")
                err = obj.get("errors")
                if isinstance(err, list) and err:
                    bad.append(f"{name}: bench recorded errors: {err}")
        else:  # CORRECTNESS_
            if not isinstance(obj, dict) or not obj:
                bad.append(f"{name}: empty correctness map")
    # Citation resolution: prose-cited artifact filenames must be
    # committed files. In --head mode both the prose CONTENT and the
    # tracked set come from HEAD (ADVICE r11: reading working-tree
    # prose against the index meant the gate could pass/fail on
    # uncommitted edits despite --head meaning "what the judge sees").
    head_mode = "--head" in sys.argv
    if head_mode:
        tracked = set(subprocess.check_output(
            ["git", "ls-tree", "-r", "--name-only", "HEAD"], text=True).split())
    else:
        tracked = set(subprocess.check_output(
            ["git", "ls-files"], text=True).split())
    prose = sorted(n for n in tracked
                   if re.fullmatch(r"(PLANS|NOTES)_r\d+\.md", n))
    cite_re = re.compile(r"\b((?:BENCH|CORRECTNESS)_[A-Za-z0-9_.]*?\.json)\b")
    for n in prose:
        if head_mode:
            text = subprocess.check_output(
                ["git", "show", f"HEAD:{n}"], text=True)
        else:
            try:
                with open(n, encoding="utf-8") as f:
                    text = f.read()
            except FileNotFoundError:
                continue  # tracked but deleted in tree
        for cited in sorted(set(cite_re.findall(text))):
            if cited not in tracked:
                bad.append(f"{n}: cites {cited}, which is not a committed file")
    # Final-cut coverage (VERDICT r12 item 3): a committed *final* full
    # bench cut of the CURRENT round must time every declared
    # non-contrast query (or list it under "errors") — r12's final cut
    # was taken at a HEAD that predated the last query landing, so
    # x_evt_bursts shipped with no entry in any full cut and the total
    # stopped being comparable round-over-round. The declared set comes
    # from DECLARED_QUERIES.json (written by gate.sh from graft.Verify's
    # dump); the check is scoped to the current round so history stays
    # green, and to "_final" cuts so mid-round partial boards don't
    # force a 7-minute sf1 re-cut per landing.
    def read(name):
        if head_mode:
            return subprocess.check_output(["git", "show", f"HEAD:{name}"])
        with open(name, "rb") as f:
            return f.read()
    if "DECLARED_QUERIES.json" in tracked:
        declared = json.loads(read("DECLARED_QUERIES.json"))
        expected = {d["name"] for d in declared if not d.get("contrast")}
        # scope to the NEWEST round that actually has a _final cut —
        # not to prose round numbers: NOTES_r{N+1} is committed at the
        # END of round N (same HEAD as round N's finals), and keying on
        # it would retire the coverage check the moment the round's
        # notes land
        final_rounds = [int(m.group(1)) for n in tracked
                        for m in [re.fullmatch(
                            r"BENCH_[A-Za-z0-9]+_r(\d+)_final\d*\.json", n)]
                        if m]
        cur = max(final_rounds) if final_rounds else 0
        final_re = re.compile(rf"BENCH_[A-Za-z0-9]+_r{cur}_final\d*\.json")
        for name, obj in sorted(bench_objs.items()):
            if not final_re.fullmatch(name):
                continue
            if obj.get("regime", {}).get("only") is not None:
                bad.append(f"{name}: a _final cut must be a full board "
                           "(regime.only is set)")
                continue
            got = (set(obj.get("queries", {})) | set(obj.get("errors", []))
                   | set(obj.get("contrast_queries", {})))
            missing = sorted(expected - got)
            if missing:
                bad.append(f"{name}: final cut misses declared non-contrast "
                           f"queries: {missing}")
    if bad:
        print("ARTIFACT CHECK FAILED:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"artifact check: {n_checked} files OK")


if __name__ == "__main__":
    main()
