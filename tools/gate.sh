#!/bin/bash
# One-command round gate (r17 verdict stretch task 8): sbt test -> Verify vs
# the DuckDB oracle -> gated bench forward + reversed-order quiet leg ->
# Gate adjudication. Emits bench_forward.json / bench_reverse.json and exits
# non-zero if any stage or gate check fails, so a hot or partial record can't
# be committed by accident.
#
#   tools/gate.sh              # full gate (~20 min on a quiet box)
#   SKIP_TESTS=1 tools/gate.sh # skip the sbt test stage (already green)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_VERIFY=${SF_VERIFY:-/root/testdata/sf0.01}
SF_BENCH=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}

echo "[gate.sh] stage 1/5: sbt compile + test"
if [ "${SKIP_TESTS:-0}" = "1" ]; then
  sbt -batch compile
else
  sbt -batch compile test
fi
sbt -batch "export Runtime/fullClasspath" | grep -E '^/' | tail -1 > /tmp/cp.txt

echo "[gate.sh] stage 2/5: Verify vs DuckDB oracle at $SF_VERIFY"
tools/run.sh graft.Verify "$SF_VERIFY" /tmp/gate_verify
python3 tools/check_oracle.py "$SF_VERIFY" /tmp/gate_verify

echo "[gate.sh] stage 3/5: official bench (forward, quiet-gated) at $SF_BENCH"
SPARK_GRAFT_SF_DIR="$SF_BENCH" tools/run.sh graft.Bench
cp bench_full.json bench_forward.json

echo "[gate.sh] stage 4/5: reversed-order quiet leg"
SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_ORDER=reverse tools/run.sh graft.Bench
cp bench_full.json bench_reverse.json

echo "[gate.sh] stage 5/5: adjudication"
tools/run.sh graft.Gate bench_forward.json bench_reverse.json
