#!/usr/bin/env bash
# Run the slow test tier and record a timestamped pass/fail summary that
# gets committed with the round snapshot (round-4 verdict item 8: the
# round-4 snapshot shipped a red flagship test because the slow tier was
# not re-run; snapshot claims must be backed by a recorded run).
#
# Usage: bash scripts/run_slow_tier.sh [extra pytest args]
# Writes SLOW_TIER.txt at the repo root and exits with pytest's status.

set -u
cd "$(dirname "$0")/.."
OUT=SLOW_TIER.txt

{
  echo "# slow-tier run: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# git: $(git rev-parse --short HEAD) ($(git status --porcelain | wc -l) dirty files)"
  echo "# cmd: python -m pytest tests/ -m slow -o addopts='' -q -rA --durations=0 $*"
} > "$OUT"

python -m pytest tests/ -m slow -o addopts="" -q -rA --durations=0 "$@" 2>&1 \
  | tee -a "$OUT"
rc=${PIPESTATUS[0]}
echo "# exit: $rc" >> "$OUT"
exit "$rc"
