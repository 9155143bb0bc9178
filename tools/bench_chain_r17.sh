#!/bin/bash
# Round-17 chain, leg $1 (a..f) — full-catalog floors at the 142-query
# HEAD. Legs a-c run all three scales (replicas in .localdata survived
# the round boundary, so sf1/sf10 mins are same-generation comparable
# with the r16 chains); d-f are sf0.1-only floor-sampling legs.
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
LEG="${1:?usage: bench_chain_r17.sh <a|b|c|d|e|f>}"
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r17${LEG}_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r17${LEG}.json 2> /tmp/bench_sf01_r17${LEG}.err
case "$LEG" in a|b|c)
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r17${LEG}_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r17${LEG}.json 2> /tmp/bench_sf1_r17${LEG}.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r17${LEG}_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r17${LEG}.json 2> /tmp/bench_sf10_r17${LEG}.err
;; esac
echo "CHAIN_${LEG}_DONE"
