#!/bin/bash
# Round-13 chain d — first floor rep at the 128-query HEAD (ann_ivfpq,
# ann_ivfpq_rerank, dedup_recall, curation_budget,
# corpus_mix_temperature, bpe_pair_counts joined the catalog).
# Replicas regenerated this session (fresh container), so sf1/sf10
# floors are same-replica comparable within round 13 session 2 only;
# cross-session comparisons go through per-query mins as always.
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r13d_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r13d.json 2> /tmp/bench_sf01_r13d.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r13d_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r13d.json 2> /tmp/bench_sf1_r13d.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r13d_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r13d.json 2> /tmp/bench_sf10_r13d.err
echo CHAIN_DONE
