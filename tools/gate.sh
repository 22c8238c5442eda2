#!/usr/bin/env bash
# One-command scoring gate (VERDICT r9 next-#4).
#
# Runs the ENTIRE correctness protocol and prints a single PASS/FAIL line:
#   1. graft.Verify — every registry query → parquet at sf0.01, plus the
#      Spark-side attest (row count, schema signature, order-independent
#      multiset hash per query).
#   2. tools/oracle_check.py — the driver's own DuckDB repr-strict compare
#      over the dumped parquet.
#   3. Diffs the fresh attest against the committed CORRECTNESS_ATTEST.json
#      and the fresh per-query oracle record against the committed
#      CORRECTNESS_SELF.json.
#
# Usage: tools/gate.sh [sf_dir] [out_dir]
#   defaults: sf_dir=/root/testdata/sf0.01  out_dir=/tmp/graft_gate_out
# Exit code 0 iff every step passes; the last stdout line is
#   GATE PASS <pass> pass, <rows-only> rows-only, <fail> fail / <n> queries; attest identical; self-record identical
# or GATE FAIL <reason>.
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_gate_out}"
rm -rf "$OUT"
mkdir -p "$OUT"

echo "[gate] 1/3 graft.Verify sweep (sf=$SF) → $OUT  (log: $OUT/verify.log)"
if ! SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify $SF $OUT" >"$OUT/verify.log" 2>&1; then
  echo "GATE FAIL verify run crashed — see $OUT/verify.log"
  exit 1
fi
VLINE=$(grep -o '[0-9]* ok, [0-9]* failed / [0-9]* queries' "$OUT/verify.log" | tail -1)
echo "[gate]    verify: ${VLINE:-summary line missing}"
V_OK=$(echo "${VLINE:-0 ok}" | grep -o '^[0-9]*')
V_FAILED=$(echo "${VLINE:-}" | grep -o '[0-9]* failed' | grep -o '[0-9]*')
if [ -z "$VLINE" ] || [ "${V_OK:-0}" -eq 0 ] || [ "${V_FAILED:-1}" -ne 0 ]; then
  grep '\[verify\].*failed' "$OUT/verify.log" | head -10
  echo "GATE FAIL verify reported ${V_FAILED:-?} failed / ${V_OK:-0} ok — see $OUT/verify.log"
  exit 1
fi

echo "[gate] 2/3 DuckDB oracle compare  (log: $OUT/oracle.log)"
python3 tools/oracle_check.py "$OUT" "$SF" "$OUT/correctness_self.json" \
  >"$OUT/oracle.log" 2>&1
ORC=$?
SUMMARY=$(grep -o '[0-9]* pass, [0-9]* rows-only, [0-9]* fail / [0-9]* queries' "$OUT/oracle.log" | tail -1)
if [ -z "$SUMMARY" ]; then
  echo "GATE FAIL oracle_check produced no summary — see $OUT/oracle.log"
  exit 1
fi
echo "[gate]    oracle: $SUMMARY"
# "0 fail / 0 queries" is a degenerate success (nothing was compared) —
# a real sweep always produces hundreds of query dirs
N_TOTAL=$(echo "$SUMMARY" | grep -o '/ [0-9]*' | grep -o '[0-9]*')
if [ "${N_TOTAL:-0}" -lt 100 ]; then
  echo "GATE FAIL oracle compared only ${N_TOTAL:-0} queries — the sweep produced no usable output ($OUT/oracle.log)"
  exit 1
fi
if [ "$ORC" -ne 0 ]; then
  grep '^FAIL' "$OUT/oracle.log" | head -20
  echo "GATE FAIL $SUMMARY — failing queries above, full log $OUT/oracle.log"
  exit 1
fi

echo "[gate] 3/3 diff vs committed evidence"
ATT_DIFF=$(python3 - "$OUT/correctness_attest.json" CORRECTNESS_ATTEST.json <<'EOF'
import json, sys
a, b = (json.load(open(p)) for p in sys.argv[1:3])
diff = sorted(k for k in set(a) | set(b) if a.get(k) != b.get(k))
print(len(diff))
for k in diff[:10]:
    sys.stderr.write(f"  attest drift: {k}: {a.get(k)} vs committed {b.get(k)}\n")
EOF
)
SELF_DIFF=$(python3 - "$OUT/correctness_self.json" CORRECTNESS_SELF.json <<'EOF'
import json, sys
a, b = (json.load(open(p)) for p in sys.argv[1:3])
diff = sorted(k for k in set(a) | set(b) if a.get(k) != b.get(k))
print(len(diff))
for k in diff[:10]:
    sys.stderr.write(f"  self-record drift: {k}\n")
EOF
)
if [ "$ATT_DIFF" != "0" ] || [ "$SELF_DIFF" != "0" ]; then
  echo "GATE FAIL $SUMMARY but $ATT_DIFF attest / $SELF_DIFF self-record entries differ from the committed baseline (drift listed above)"
  exit 1
fi
echo "GATE PASS $SUMMARY; attest identical; self-record identical"
