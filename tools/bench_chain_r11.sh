#!/bin/bash
# Round-11 scale-evidence chain. Runs, strictly in sequence:
#   1. sf0.1  min-of-2 reps, default 16g heap (the driver's official condition,
#      hardened: the REPS=2 floor settles the r10 builder-chain stragglers)
#   2. sf1    x2 fresh sessions at 96g (comparable to the r6-r9 sf1 chains)
#   3. LshStats on sf1 (kmeans emitted_pairs > 0 proof, VERDICT r10 task 1d)
#   4. sf10   x2 fresh sessions at 96g
# Artifacts land in the repo root as BENCH_*_r11*.json / LSHSTATS_sf1_r11.json.
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r11.json 2> /tmp/bench_sf01_r11.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r11.json 2> /tmp/bench_sf1_r11.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r11b.json 2> /tmp/bench_sf1_r11b.err
tools/run_main.sh -Xmx96g graft.LshStats .localdata/sf1 \
  > LSHSTATS_sf1_r11.json 2> /tmp/lshstats_sf1_r11.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r11.json 2> /tmp/bench_sf10_r11.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r11b.json 2> /tmp/bench_sf10_r11b.err
echo CHAIN_DONE
