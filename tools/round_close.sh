#!/usr/bin/env bash
# Round-end hygiene (VERDICT r20 #1 — the recurring manual step, scripted):
# stage the round's driver/bench artifacts and fail loudly if anything that
# should ride the round's final commit is still dirty or missing.
#
#   tools/round_close.sh <round-number>     e.g. tools/round_close.sh 21
#
# Exits non-zero (and says why) unless, after staging, `git status` is clean
# except for the staged set — the condition "clean git status on round HEAD".
set -euo pipefail
cd "$(dirname "$0")/.."

r="${1:?usage: round_close.sh <round-number>}"

# Stage every per-round artifact that exists (driver files land untracked).
for f in BENCH_r$r.json CORRECTNESS_r$r.json VERIFY_r$r.json PERF_r$r.json \
         LEAKCHECK.json graft_bench_compact.json BENCH_NOTES.md ADVICE.md \
         VERDICT.md README.md OPTIMIZATION_r$r.md; do
  [ -e "$f" ] && git add "$f"
done
# kept bench artifacts and plan dumps of the round
ls BENCH_*_r${r}*_kept.json >/dev/null 2>&1 && git add BENCH_*_r${r}*_kept.json
[ -d plans/r$r ] && git add plans/r$r

# ADVICE.md must mention every finding as fixed/accepted/noted or be
# regenerated this round — heuristic: it must have been touched on a commit
# no older than the newest BENCH artifact, else warn.
if [ -e "BENCH_r$r.json" ] && [ "ADVICE.md" -ot "BENCH_r$r.json" ]; then
  echo "WARN: ADVICE.md is older than BENCH_r$r.json — refresh it" >&2
fi

dirty=$(git status --porcelain | grep -v '^[AM] ' || true)
if [ -n "$dirty" ]; then
  echo "round_close: unstaged/untracked files remain:" >&2
  echo "$dirty" >&2
  exit 1
fi
echo "round_close: staged round-$r artifacts; tree otherwise clean."
