#!/bin/bash
# Round-14 chain b — second floor rep at the 134-query HEAD
# (knn_mutual_pairs landed after chain a's 133). Same .localdata
# replica generation as r13d-g and r14, so per-query mins are
# same-replica comparable across all of them.
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r14b_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r14b.json 2> /tmp/bench_sf01_r14b.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r14b_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r14b.json 2> /tmp/bench_sf1_r14b.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r14b_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r14b.json 2> /tmp/bench_sf10_r14b.err
echo CHAIN_DONE
