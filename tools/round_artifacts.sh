#!/bin/bash
# Round-close gate: fail LOUDLY when round artifacts are dirty.
#
# The judge flagged uncommitted round artifacts at judge time in r7,
# r8 AND r9 (BENCH_r*.json / CORRECTNESS_r*.json untracked,
# BENCH_FLOORS.json / LEAKCHECK.json modified-unstaged). Run this as
# the LAST step of the gate loop before closing a round; a non-zero
# exit means the round-close commit is incomplete.
cd "$(dirname "$0")/.." || exit 2
dirty=$(git status --porcelain -- \
  BENCH_FLOORS.json LEAKCHECK.json COPYCHECK.json \
  'BENCH_r*.json' 'CORRECTNESS_r*.json' \
  BASELINE.md SCALING.md EXPLAIN.md PLANS.md SURVEY.md)
if [ -n "$dirty" ]; then
  echo "ROUND ARTIFACTS DIRTY — commit these before round close:" >&2
  echo "$dirty" >&2
  exit 1
fi
echo "round artifacts clean"
