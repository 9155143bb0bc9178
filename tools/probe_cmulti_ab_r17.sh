#!/bin/bash
# Round-17 dedup_clusters_multi attribution A/B (VERDICT r16 next-#4):
# the only shared-query sf0.1 floor move beyond +10% in r16
# (2.51 -> 2.91 s) on an untouched plan. Same playbook that closed
# inverted_index in r16 and ann_ivfpq in r15: compile the r15 HEAD
# (c8c563f — the round whose chains measured the 2.51 floor) in its own
# worktree, interleave ONLY-pair repro runs of the two binaries on the
# same host in the same hour, wordcount riding along as the flat-floor
# control. 6 interleaved rounds => n=6 mins per binary.
#
# Prereq (run BEFORE, not during, any bench):
#   git worktree add /tmp/r15head c8c563f && (cd /tmp/r15head && sbt compile)
# Do NOT compile or run sbt in /root/repo while this runs.
cd "$(dirname "$0")/.." || exit 1
set -x
for i in 1 2 3 4 5 6; do
  SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_BENCH_ONLY=dedup_clusters_multi,wordcount \
    SPARK_GRAFT_BENCH_FULL=/tmp/cmulti_r17head_${i}_full.json \
    tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
    > /tmp/cmulti_r17head_${i}.json 2> /dev/null
  SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_BENCH_ONLY=dedup_clusters_multi,wordcount \
    SPARK_GRAFT_BENCH_FULL=/tmp/cmulti_r15head_${i}_full.json \
    /tmp/r15head/tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
    > /tmp/cmulti_r15head_${i}.json 2> /dev/null
done
echo CMULTI_AB_DONE
