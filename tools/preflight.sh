#!/usr/bin/env bash
# Preflight gate: run before ANY end-of-round / milestone commit.
# Round 9 shipped a snapshot that did not compile (a referenced class was
# never written), voiding the round's correctness and bench artifacts —
# this script makes "compile green before snapshot" mechanical.
#
# Usage: tools/preflight.sh [--test]
#   default : sbt compile + Test/compile (fast, the r9 failure class)
#   --test  : additionally runs the full ScalaTest suite
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt compile + Test/compile"
sbt -batch compile Test/compile

if [[ "${1:-}" == "--test" ]]; then
  echo "[preflight] sbt test"
  sbt -batch test
fi

echo "[preflight] OK"
