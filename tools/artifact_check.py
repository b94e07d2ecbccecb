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

Usage: tools/artifact_check.py [--head|--selftest]
  default:    checks the working-tree files
  --head:     checks the blobs as committed at HEAD (what the judge sees)
  --selftest: checks the final-cut filename parser against a pinned list
              and replays the family-drift rule on round 13's committed
              sf1 final (which must trip it)
"""
import json
import re
import subprocess
import sys

# Final-cut filename parser (ADVICE r13: the old [A-Za-z0-9]+ prefix
# forbade underscores, so an underscored family or a `_final_firstcut`
# suffix silently bypassed round detection AND the coverage gate).
# Groups: (family, round, suffix). suffix '' or digits = a numbered
# final in the baseline lineage; any other suffix (e.g. '_firstcut') is
# a kept EXHIBIT — still coverage- and drift-checked when current-round,
# never used as a comparison baseline.
FINAL_RE = re.compile(r"BENCH_([A-Za-z0-9_]+?)_r(\d+)_final([A-Za-z0-9_]*)\.json")

# Same-day code-vs-host A/B chain artifacts (the r13 discipline): a
# cut of the SAME board taken at another round's code within the same
# window, named BENCH_*CODE_SAMEDAY*_r{N}*.json. Presence of one whose
# "sf" matches a drifting final waives the family-drift failure.
SAMEDAY_RE = re.compile(r"BENCH_[A-Za-z0-9_]*CODE_SAMEDAY[A-Za-z0-9_]*_r(\d+)[A-Za-z0-9_]*\.json")


def parse_final(name):
    m = FINAL_RE.fullmatch(name)
    if not m:
        return None
    fam, rnd, suffix = m.group(1), int(m.group(2)), m.group(3)
    lineage = suffix == "" or suffix.isdigit()
    seq = 1 if suffix == "" else (int(suffix) if suffix.isdigit() else 0)
    return fam, rnd, lineage, seq


def query_family(q):
    """Per-query family for drift aggregation: x_<family>_... queries
    group on the segment after x_; everything else is the core board."""
    if q.startswith("x_"):
        parts = q.split("_")
        return parts[1] if len(parts) > 1 else "x"
    return "core"


def family_drift(cur_obj, prev_obj, threshold=1.5, floor=1.0):
    """Per-family time sums over the COMMON query set; returns the
    families whose current sum exceeds threshold x previous (previous
    >= floor seconds, so micro-families can't trip on noise)."""
    common = set(cur_obj.get("queries", {})) & set(prev_obj.get("queries", {}))
    cur_f, prev_f = {}, {}
    for q in common:
        f = query_family(q)
        cur_f[f] = cur_f.get(f, 0.0) + cur_obj["queries"][q]
        prev_f[f] = prev_f.get(f, 0.0) + prev_obj["queries"][q]
    return [(f, prev_f[f], cur_f[f]) for f in sorted(cur_f)
            if prev_f[f] >= floor and cur_f[f] > prev_f[f] * threshold]


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
        if name == "BENCH_HISTORY.json":
            # derived per-query history index (tools/bench_history.py),
            # not a cut — no 'queries' map by design
            if not isinstance(obj, dict) or not obj:
                bad.append(f"{name}: empty history index")
        elif name.startswith("BENCH_"):
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
        finals = {n: parse_final(n) for n in tracked if parse_final(n)}
        cur = max((p[1] for p in finals.values()), default=0)
        for name, obj in sorted(bench_objs.items()):
            p = finals.get(name)
            if not p or p[1] != cur:
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
        # Family-drift rule, mechanized (VERDICT r13 item 2): each
        # current-round final compares per-family against the PREVIOUS
        # round's latest lineage final of the same file-family (LOCAL /
        # SF1 / ...). Any family over ~1.5x fails unless a same-day
        # code-vs-host A/B chain artifact (BENCH_*CODE_SAMEDAY*_r{cur})
        # at the SAME scale factor is committed alongside — r13 proved
        # the chain discipline at sf0.1, then shipped the sf1 cut with
        # pipeline at 1.59x and no sf1 chain; this check makes that
        # omission a gate failure. Applies from round 14 on (r13's
        # cuts were judged under the prose rule; --selftest replays the
        # rule on them to prove it would have fired).
        sameday_sfs = set()
        for name, obj in bench_objs.items():
            m = SAMEDAY_RE.fullmatch(name)
            if m and int(m.group(1)) == cur:
                sameday_sfs.add(str(obj.get("sf", "")))
        for name, obj in sorted(bench_objs.items()):
            p = finals.get(name)
            if not p or p[1] != cur or cur < 14:
                continue
            fam = p[0]
            prev_cands = [(pp[1], pp[3], n) for n, pp in finals.items()
                          if pp[0] == fam and pp[2] and pp[1] < cur
                          and n in bench_objs]
            if not prev_cands:
                continue
            prev_name = max(prev_cands)[2]
            drifted = family_drift(obj, bench_objs[prev_name])
            if drifted and str(obj.get("sf", "")) not in sameday_sfs:
                det = ", ".join(f"{f}: {a:.1f}s -> {b:.1f}s ({b / a:.2f}x)"
                                for f, a, b in drifted)
                bad.append(
                    f"{name}: family drift vs {prev_name} over 1.5x with no "
                    f"same-day A/B chain artifact at sf={obj.get('sf')}: {det}")
    if bad:
        print("ARTIFACT CHECK FAILED:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"artifact check: {n_checked} files OK")


def selftest():
    # Filename-parser pins (ADVICE r13: the exact escapes the old regex
    # allowed). (name, expected (family, round, lineage, seq) or None).
    cases = [
        ("BENCH_LOCAL_r13_final.json", ("LOCAL", 13, True, 1)),
        ("BENCH_LOCAL_r12_final3.json", ("LOCAL", 12, True, 3)),
        ("BENCH_SF1_r13_final.json", ("SF1", 13, True, 1)),
        ("BENCH_LOCAL_r13_final_firstcut.json",
         ("LOCAL", 13, False, 0)),                       # exhibit: checked, never a baseline
        ("BENCH_EDITDIST_SF1_r14_final.json",
         ("EDITDIST_SF1", 14, True, 1)),                 # underscored family
        ("BENCH_LOCAL_r13.json", None),                  # not a final
        ("BENCH_R12CODE_SAMEDAY_r13.json", None),        # chain artifact, not a final
        ("CORRECTNESS_r13.json", None),
    ]
    for name, want in cases:
        got = parse_final(name)
        assert got == want, f"parse_final({name}) = {got}, want {want}"
    assert SAMEDAY_RE.fullmatch("BENCH_R12CODE_SAMEDAY_r13.json")
    assert SAMEDAY_RE.fullmatch("BENCH_R13CODE_SAMEDAY_SF1_r14.json")
    assert not SAMEDAY_RE.fullmatch("BENCH_LOCAL_r13_final.json")
    # Drift-rule replay on committed history: round 13's sf1 final
    # shipped with the pipeline family at 1.59x of r12-final3 and no
    # sf1 chain — the exact omission the rule exists to catch.
    with open("BENCH_SF1_r13_final.json") as f:
        cur = json.load(f)
    with open("BENCH_SF1_r12_final3.json") as f:
        prev = json.load(f)
    drifted = family_drift(cur, prev)
    fams = [f for f, _, _ in drifted]
    assert "pipeline" in fams, \
        f"drift replay should flag the pipeline family, got {drifted}"
    print(f"artifact check selftest: {len(cases)} filename pins OK, "
          f"r13-sf1 drift replay flags {fams}")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
    else:
        main()
