#!/bin/bash
# Round-13 chain f — third floor rep at the 130-query final HEAD.
# plus event_attribution and ann_pq_indexed). Same regenerated replicas
# as r13d, so sf1/sf10 floors are same-replica comparable with it.
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r13f_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r13f.json 2> /tmp/bench_sf01_r13f.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r13f_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r13f.json 2> /tmp/bench_sf1_r13f.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r13f_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r13f.json 2> /tmp/bench_sf10_r13f.err
echo CHAIN_DONE
