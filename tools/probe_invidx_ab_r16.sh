#!/bin/bash
# Round-16 inverted_index attribution A/B (VERDICT r15 next-#3): the
# 0.653 -> 0.867 s sf0.1 floor move survived n=6 sampling in r15 and is
# the only untouched-plan movement left unattributed. Same playbook that
# closed ann_ivfpq in r15: compile the r14 HEAD (b17946e — the last
# round whose chains measured the 0.653 floor) in its own worktree, then
# interleave ONLY-pair repro runs of the two binaries on the same host
# in the same hour. wordcount rides along as the flat-floor control
# (same corpus scan, untouched plan, never moved). 6 interleaved rounds
# => n=6 mins per binary.
#
# Prereq (run BEFORE, not during, any bench):
#   git worktree add /tmp/r14head b17946e && (cd /tmp/r14head && sbt compile)
# Do NOT compile or run sbt in /root/repo while this runs.
cd "$(dirname "$0")/.." || exit 1
set -x
for i in 1 2 3 4 5 6; do
  SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_BENCH_ONLY=inverted_index,wordcount \
    SPARK_GRAFT_BENCH_FULL=/tmp/invidx_r16head_${i}_full.json \
    tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
    > /tmp/invidx_r16head_${i}.json 2> /dev/null
  SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_BENCH_ONLY=inverted_index,wordcount \
    SPARK_GRAFT_BENCH_FULL=/tmp/invidx_r14head_${i}_full.json \
    /tmp/r14head/tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
    > /tmp/invidx_r14head_${i}.json 2> /dev/null
done
echo INVIDX_AB_DONE
