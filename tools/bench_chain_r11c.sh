#!/bin/bash
# Round-11 final chain, at the HEAD that carries the Shiloach–Vishkin
# root-hooking CC rewrite (the 5 sf10 convergence failures of chain 2)
# plus the two layout fixes. One run per scale, zero expected failures:
# these are the round's headline artifacts.
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r11c.json 2> /tmp/bench_sf01_r11c.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r11d.json 2> /tmp/bench_sf1_r11d.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r11e.json 2> /tmp/bench_sf10_r11e.err
echo CHAIN_DONE
