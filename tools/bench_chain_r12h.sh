#!/bin/bash
# Round-12 final chain, at the HEAD that adds ann_recall (121 queries)
# and the nprobe own-cell fix. Min-of-2 everywhere, full artifacts.
# StreamBench is omitted: the streaming paths are byte-identical to the
# r12g chain's HEAD (BENCH_stream_r12g.json stands).
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r12i_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r12i.json 2> /tmp/bench_sf01_r12i.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r12h_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r12h.json 2> /tmp/bench_sf1_r12h.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r12h_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r12h.json 2> /tmp/bench_sf10_r12h.err
echo CHAIN_DONE
