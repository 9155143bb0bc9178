#!/bin/bash
# Round-12 scale-evidence chain — one min-of-2 chain per scale (the r11
# verdict's "REPS=2 everywhere" ask), strictly in sequence:
#   1. sf0.1  min-of-2, default 16g heap (the driver's official condition)
#   2. sf1    min-of-2 at 96g
#   3. StreamBench on sf1 (per-batch incremental-dedup floors — the
#      delta-proportional publish claim, BENCH_stream_r12.json)
#   4. sf10   min-of-2 at 96g
# NOTE with the round-12 session cache, rep 2 of a cached query measures
# the WARM steady state — per-query floors are session-steady-state
# numbers; the full-JSON "wall" field carries the true elapsed time
# including every cold build, so the artifact cannot overstate health.
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r12_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r12.json 2> /tmp/bench_sf01_r12.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r12_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r12.json 2> /tmp/bench_sf1_r12.err
tools/run_main.sh -Xmx96g graft.StreamBench .localdata/sf1 \
  > BENCH_stream_r12.json 2> /tmp/bench_stream_r12.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r12_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r12.json 2> /tmp/bench_sf10_r12.err
echo CHAIN_DONE
