#!/usr/bin/env bash
# CI gate: the two long verifications that form the regression net, as ONE
# command (r5 VERDICT next-round #8).
#
#   1. full pytest suite (~470 tests, ~13 min on local[32])
#   2. scripts/selfcheck.py — every registry query's Spark plan vs its
#      DuckDB oracle at sf0.01, value-compared (~11 min); output is diffed
#      against the expected-green manifest scripts/ci_expected.txt so a
#      red row (or a silently vanished query) fails loudly.
#
# Usage:  bash scripts/ci.sh            # from the repo root
#         SPARK_GRAFT_SF_DIR=... bash scripts/ci.sh   # other oracle tier
#
# After REGISTERING a new driver query, regenerate the manifest with:
#         bash scripts/ci.sh --regen
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

EXPECTED=scripts/ci_expected.txt
ACTUAL=$(mktemp)
trap 'rm -f "$ACTUAL"' EXIT

if [[ "${1:-}" == "--regen" ]]; then
  python scripts/selfcheck.py | grep -E '^(ok|FAIL|rows-only)' | sort > "$EXPECTED"
  echo "regenerated $EXPECTED ($(wc -l < "$EXPECTED") rows)"
  exit 0
fi

echo "== pytest =="
python -m pytest tests/ -q

echo "== selfcheck vs $EXPECTED =="
python scripts/selfcheck.py | grep -E '^(ok|FAIL|rows-only)' | sort > "$ACTUAL"
if ! diff -u "$EXPECTED" "$ACTUAL"; then
  echo "CI: selfcheck output drifted from the expected-green manifest" >&2
  exit 1
fi
echo "CI GREEN: pytest + $(wc -l < "$EXPECTED") selfcheck rows match the manifest"
