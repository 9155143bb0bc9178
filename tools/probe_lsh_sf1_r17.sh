#!/bin/bash
# Round-17 dedup_minhash_lsh sf1 re-check (VERDICT r16 next-#3): r16's
# isolated min read 6.19 s vs r15's 4.56 floor, booked as replica
# generation + epoch band but explicitly not closed. The replicas
# SURVIVED the r16->r17 boundary this time, so this run is
# same-generation with the r16 legs. Quiet-host isolated repro, reps=3,
# dedup_minhash and wordcount as controls.
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_ONLY=dedup_minhash_lsh,dedup_minhash,wordcount \
  SPARK_GRAFT_BENCH_FULL=/tmp/lsh_sf1_r17_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > /tmp/lsh_sf1_r17.json 2> /dev/null
echo LSH_SF1_DONE
