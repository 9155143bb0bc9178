#!/bin/bash
# Round-12 FINAL chain at the HEAD that replaces the exact-percentile
# aggregate with the counts+window Quantiles operator (the G1 heap-bomb
# fix measured in SCALE.md round 12) and anchors the keyed-sink
# generation regex. Same protocol as r12d: min-of-2 everywhere, full
# self-diagnosing artifacts, StreamBench between the sf1 and sf10 legs.
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r12e_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r12e.json 2> /tmp/bench_sf01_r12e.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r12e_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r12e.json 2> /tmp/bench_sf1_r12e.err
tools/run_main.sh -Xmx96g graft.StreamBench .localdata/sf1 \
  > BENCH_stream_r12e.json 2> /tmp/bench_stream_r12e.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r12e_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r12e.json 2> /tmp/bench_sf10_r12e.err
echo CHAIN_DONE
