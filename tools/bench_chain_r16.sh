#!/bin/bash
# Round-16 chain, leg $1 (a..f) — full-catalog floors at the 140-query
# HEAD (bpe_encode joined the 139; the kNN graph now builds on the
# two-level coarse quantizer; pipeline_curate_semantic gets its first
# chain floors — VERDICT r15 next-#2). Legs a-c run all three scales
# (the clean sf1/sf10 floors r15 could not ship); d-f are sf0.1-only
# floor-sampling legs. Replicas survived the round boundary, so sf1/sf10
# mins are same-generation comparable with the r15 chains.
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
LEG="${1:?usage: bench_chain_r16.sh <a|b|c|d|e|f>}"
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r16${LEG}_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r16${LEG}.json 2> /tmp/bench_sf01_r16${LEG}.err
case "$LEG" in a|b|c)
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r16${LEG}_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r16${LEG}.json 2> /tmp/bench_sf1_r16${LEG}.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r16${LEG}_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r16${LEG}.json 2> /tmp/bench_sf10_r16${LEG}.err
;; esac
echo "CHAIN_${LEG}_DONE"
