#!/bin/bash
# Round-11 second chain: same HEAD as the first chain PLUS the two layout
# fixes (ScaleData row-group policy, kmeans compute repartition), against
# the rebuilt .localdata replicas.
#   - sf0.1 min-of-2 at the driver's condition (16g): the first chain's
#     sf0.1 leg overlapped builder activity; this is the clean floor.
#   - sf1 x1 at the new layout (the old-layout pair a/b is kept for
#     r9 comparability).
#   - sf10 x2 at the new layout: the headline scale evidence.
#   - LshStats at sf10: kmeans emitted_pairs at the largest measured scale.
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r11b.json 2> /tmp/bench_sf01_r11b.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r11c.json 2> /tmp/bench_sf1_r11c.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r11c.json 2> /tmp/bench_sf10_r11c.err
tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r11d.json 2> /tmp/bench_sf10_r11d.err
tools/run_main.sh -Xmx96g graft.LshStats .localdata/sf10 \
  > LSHSTATS_sf10_r11.json 2> /tmp/lshstats_sf10_r11.err
echo CHAIN_DONE
