#!/bin/bash
# Round-13 chain b — same protocol and HEAD (floor robustness rep), at the HEAD that greens the two r12 PQ rows
# (embedding_pq_codes packed-BIGINT codes, CAST(SUM) oracle mirrors) —
# 122 oracle-checked queries, all of them in every leg, which also
# commits the first sf10 floor for agg_grouping_sets (VERDICT r12 #3).
# Min-of-2 everywhere, full self-diagnosing artifacts. StreamBench runs
# the NEW 24-batch attributed replay (probe/publish/compaction split —
# VERDICT r12 #4) between the sf1 and sf10 legs.
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r13b_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r13b.json 2> /tmp/bench_sf01_r13b.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r13b_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r13b.json 2> /tmp/bench_sf1_r13b.err
SPARK_GRAFT_STREAM_BATCHES=24 SPARK_GRAFT_SF_DIR=.localdata/sf1 \
  tools/run_main.sh -Xmx96g graft.StreamBench \
  > BENCH_stream_r13b.json 2> /tmp/bench_stream_r13b.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r13b_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r13b.json 2> /tmp/bench_sf10_r13b.err
echo CHAIN_DONE
