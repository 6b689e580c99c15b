#!/usr/bin/env bash
# Mechanical pre-snapshot gate: the LAST action of every round.
#
#   tools/snapshot_check.sh [q1,q2,...]
#
# Compiles the EXACT tree about to be committed, then runs the sf0.01
# Verify slice for the given comma-separated gate keys (default: a
# smoke set) and checks them against the DuckDB oracle. Exits non-zero
# on any failure — do NOT snapshot-commit if this script fails.
set -euo pipefail
cd "$(dirname "$0")/.."

GATES="${1:-q01_emit_sum,q115_mango_find,q158_ivfpq_ann}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/snapshot_check.XXXXXX)"

echo "[snapshot_check] sbt compile ..."
sbt -batch compile

echo "[snapshot_check] Verify slice: $GATES @ $SF_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT $GATES"

echo "[snapshot_check] oracle check ..."
python3 tools/check_oracle.py "$SF_DIR" "$OUT"

echo "[snapshot_check] OK — safe to snapshot."
