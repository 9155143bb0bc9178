#!/bin/bash
# ann_ivfpq drift attribution (VERDICT r14 next-#3), A/B on the SAME
# host, same hour, same replicas: the ONLY-five isolated repro (the
# approx_distinct playbook) at r15 HEAD vs a compiled r13-HEAD worktree
# (/tmp/r13head, detached at 2527ffe). ann_ivf / ann_ivf_nprobe /
# ann_pq ride along as controls: r13->r14 chain floors kept them flat
# (so the drift was not a global host band), and here they normalize
# any residual band between the A and B runs. REPS=3 -> per-query min.
# Requires .localdata/sf10 and a quiet machine (bench protocol).
cd "$(dirname "$0")/.." || exit 1
ONLY=ann_ivf,ann_ivf_nprobe,ann_ivfpq,ann_ivfpq_rerank,ann_pq
set -x
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_ivfpq_r15_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_ivfpq_r15.json 2> /tmp/bench_ivfpq_sf01_r15.err
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/root/repo/BENCH_sf0.1_ivfpq_r13head_full.json \
  /tmp/r13head/tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_ivfpq_r13head.json 2> /tmp/bench_ivfpq_sf01_r13head.err
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf10_ivfpq_r15_full.json \
  tools/run_main.sh -Xmx96g graft.Bench /root/repo/.localdata/sf10 \
  > BENCH_sf10_ivfpq_r15.json 2> /tmp/bench_ivfpq_sf10_r15.err
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/root/repo/BENCH_sf10_ivfpq_r13head_full.json \
  /tmp/r13head/tools/run_main.sh -Xmx96g graft.Bench /root/repo/.localdata/sf10 \
  > BENCH_sf10_ivfpq_r13head.json 2> /tmp/bench_ivfpq_sf10_r13head.err
echo IVFPQ_AB_DONE
