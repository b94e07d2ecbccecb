#!/usr/bin/env bash
# Full local correctness gate over BOTH events.ts parquet layouts
# (VERDICT r7 item 2: a layout-conditional bug passed 130/130 locally
# and went red on the driver — the gate must exercise the layout the
# local testdata does NOT ship).
#
# Usage: tools/gate.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-target/verify_gate}

# VERDICT r9 item 3: refuse to pass with an empty/unparsable committed
# bench or correctness artifact (r9 snapshotted a 0-byte BENCH json).
python3 tools/artifact_check.py
python3 tools/artifact_check.py --head

echo "=== pass 1: shipped layout ($SF) ==="
sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check.py "$SF" "$OUT"
# Refresh the committed board manifest (VERDICT r12 item 3): the
# final-cut coverage check in artifact_check.py reads this to learn
# the declared non-contrast set without running sbt.
cp "$OUT/declared_queries.json" DECLARED_QUERIES.json
# VERDICT r9 item 4: the three DuckDB-inexpressible queries pin against
# the reference's own stack (SQLite FTS5 porter) + a tolerance band
python3 tools/golden_fts.py "$SF" "$OUT"

ALT="target/testdata/$(basename "$SF")_alt"
python3 tools/alt_layout.py "$SF" "$ALT"
ALTABS=$(readlink -f "$ALT")
echo "=== pass 2: flipped layout ($ALTABS) ==="
sbt -batch "runMain graft.Verify $ALTABS ${OUT}_alt"
python3 tools/check.py "$ALTABS" "${OUT}_alt"
echo "=== both layouts green ==="
