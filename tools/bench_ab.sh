#!/bin/bash
# Full-suite bench WITH the in-artifact same-code A/B calibration.
#
# Usage: tools/bench_ab.sh <prev-round-commit> [sfDir]
#
# Builds the previous round's classes in a scratch git worktree, exports
# both classpaths, and runs graft.Bench with SPARK_GRAFT_AB_PREV_CP /
# SPARK_GRAFT_AB_CUR_CP set — the bench then runs the pinned 15-query
# calibration subset in alternating child JVMs (prev, cur, prev, cur)
# and embeds `ab.cur_over_prev` in BENCH_FULL.json. A ratio ≈ 1.0 means
# the two builds are the same speed on TODAY'S box: any gate-ratio drift
# vs the previous round's artifact is then box weather or the DuckDB
# denominator, machine-checkably not a plan regression.
#
# Run this on a QUIET box and serialize it with everything else (the
# repo's bench-contamination rule applies to the A/B children too).
set -e -o pipefail
PREV=${1:?usage: tools/bench_ab.sh <prev-round-commit> [sfDir]}
SF=${2:-/root/testdata/sf0.1}
cd "$(dirname "$0")/.."

# Cache validity = marker matches AND the cached classpath still resolves
# to a real directory (a /tmp sweep of the worktree invalidates it). A
# FAILED build must never be cached: the marker is written only after the
# classpath file is verified non-empty.
WT=/tmp/graft_ab_prev
cache_ok=false
if [ "$(cat /tmp/graft_prev_cp_commit.txt 2>/dev/null)" = "$PREV" ] \
   && [ -s /tmp/graft_prev_cp.txt ] \
   && [ -d "$WT/target/scala-2.13/classes" ]; then
  cache_ok=true
fi
if [ "$cache_ok" != "true" ]; then
  rm -f /tmp/graft_prev_cp_commit.txt
  rm -rf "$WT"
  git worktree add --detach "$WT" "$PREV" >/dev/null
  # The worktree must OUTLIVE this script: the exported classpath points
  # into $WT/target. It is /tmp scratch; `git worktree prune` reclaims it.
  (cd "$WT" && sbt -batch compile 'export Runtime/fullClasspath' 2>/dev/null \
    | grep -E '^/' | tail -1 > /tmp/graft_prev_cp.txt)
  if [ ! -s /tmp/graft_prev_cp.txt ]; then
    echo "bench_ab: building $PREV in $WT produced no classpath — fix the" \
         "build before benching (the A/B would silently read ab:null)" >&2
    exit 1
  fi
  echo "$PREV" > /tmp/graft_prev_cp_commit.txt
fi

sbt -batch compile 'export Runtime/fullClasspath' 2>/dev/null \
  | grep -E '^/' | tail -1 > /tmp/graft_cur_cp.txt
# run.sh launches the MAIN bench from /tmp/graft_cp.txt — keep it current.
cp /tmp/graft_cur_cp.txt /tmp/graft_cp.txt

SPARK_GRAFT_AB_PREV_CP=/tmp/graft_prev_cp.txt \
SPARK_GRAFT_AB_CUR_CP=/tmp/graft_cur_cp.txt \
SPARK_GRAFT_SF_DIR="$SF" \
exec tools/run.sh graft.Bench
