#!/bin/bash
# Round-12 third chain — the round's OFFICIAL floors, at the HEAD that
# adds: the native winnow_fps kernel, the single-pass gopher_repetition
# gram battery, tokenize-once + sh-pre-partitioned text_dedup_token_spans,
# session-cached decontamination flags and per-lang quality medians,
# dedup_cluster_stats, and the aggregate/join JIT warmup in Bench.
#   1. sf0.1  min-of-2, default 16g heap (the driver's official condition)
#   2. sf1    min-of-2 at 96g
#   3. StreamBench on sf1 (per-batch incremental-dedup floors)
#   4. sf10   min-of-2 at 96g
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r12c_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r12c.json 2> /tmp/bench_sf01_r12c.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r12c_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r12c.json 2> /tmp/bench_sf1_r12c.err
tools/run_main.sh -Xmx96g graft.StreamBench .localdata/sf1 \
  > BENCH_stream_r12c.json 2> /tmp/bench_stream_r12c.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r12c_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r12c.json 2> /tmp/bench_sf10_r12c.err
echo CHAIN_DONE
