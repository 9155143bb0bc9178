#!/bin/bash
# Round-12 FINAL chain — the round's official floors, at the HEAD that
# adds: the LSM-leveled keyed sink (delta-proportional streaming
# publish), the native LineFilterStats / GopherGramStats /
# GopherLineStats / GramMultisetStats kernels (line_filter,
# gopher_repetition, doc_repetition, doc_fingerprint, token_diversity
# are now shuffle-free per-document scans), and the truncation-proof
# three-line bench output.
#   1. sf0.1  min-of-2, default 16g heap (the driver's official condition)
#   2. sf1    min-of-2 at 96g
#   3. StreamBench on sf1 (per-batch incremental-dedup floors, LSM sink)
#   4. sf10   min-of-2 at 96g
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r12d_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r12d.json 2> /tmp/bench_sf01_r12d.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r12d_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r12d.json 2> /tmp/bench_sf1_r12d.err
tools/run_main.sh -Xmx96g graft.StreamBench .localdata/sf1 \
  > BENCH_stream_r12d.json 2> /tmp/bench_stream_r12d.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r12d_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r12d.json 2> /tmp/bench_sf10_r12d.err
echo CHAIN_DONE
