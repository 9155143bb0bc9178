#!/bin/bash
# Round-12 chain g, at the HEAD that adds the five session-12b operators
# (curation_dsir, mine_hard_negatives, mine_semi_hard_negatives,
# event_retention, window_ntile — 120 oracle-checked queries, the
# catalog size AT THIS CHAIN'S HEAD; the round-12 final HEAD has 122).
# Same
# protocol as r12d/e/f: min-of-2 everywhere, full self-diagnosing
# artifacts, StreamBench between the sf1 and sf10 legs. Replicas were
# regenerated this session (driver wipes .localdata between rounds).
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r12h_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r12h.json 2> /tmp/bench_sf01_r12h.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r12g_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r12g.json 2> /tmp/bench_sf1_r12g.err
tools/run_main.sh -Xmx96g graft.StreamBench .localdata/sf1 \
  > BENCH_stream_r12g.json 2> /tmp/bench_stream_r12g.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r12g_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r12g.json 2> /tmp/bench_sf10_r12g.err
echo CHAIN_DONE
