#!/bin/bash
# Round-14 chain — first full-catalog floors at the 133-query HEAD
# (bpe_merges and knn_join joined the 131; dedup_recall grew the
# union_sig_lsh row; ann_recall ladders knn_join). Replicas are the
# SAME .localdata sf1/sf10 generation as the r13d-g chains, so floors
# are same-replica comparable with round 13.
# After the benches: the recall/dedup-recall probes, the 24-batch
# attributed stream replay (now including last-touch attribution), and
# the sf30 probe of the two dedup family ceilings (VERDICT r13 #5).
# Do NOT compile or run sbt while this chain runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r14_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r14.json 2> /tmp/bench_sf01_r14.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r14_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r14.json 2> /tmp/bench_sf1_r14.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r14_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r14.json 2> /tmp/bench_sf10_r14.err
# ---- probes (each one JSON line; sf0.01 values are the oracle's) ----
tools/run_main.sh -Xmx96g graft.DedupRecallProbe .localdata/sf1 \
  > DEDUPRECALL_sf1_r14.json 2> /tmp/dedup_recall_sf1_r14.err
tools/run_main.sh -Xmx96g graft.DedupRecallProbe .localdata/sf10 \
  > DEDUPRECALL_sf10_r14.json 2> /tmp/dedup_recall_sf10_r14.err
tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf1 \
  > RECALL_sf1_r14.json 2> /tmp/recall_sf1_r14.err
tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf10 \
  > RECALL_sf10_r14.json 2> /tmp/recall_sf10_r14.err
SPARK_GRAFT_PQ_K=256 tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf1 \
  > RECALL_sf1_pqk256_r14.json 2> /tmp/recall_pqk256_r14.err
# ---- 24-batch incremental-dedup + attribution stream replay ----
SPARK_GRAFT_STREAM_BATCHES=24 tools/run_main.sh -Xmx48g graft.StreamBench /root/testdata/sf0.1 \
  > BENCH_stream_r14.json 2> /tmp/stream_r14.err
# ---- sf30: one decade further for the dedup family ceilings ----
tools/run_main.sh -Xmx96g graft.ScaleData .localdata/sf10 .localdata/sf30 3 \
  2> /tmp/scaledata_sf30.err
SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_ONLY=dedup_minhash_lsh,dedup_clusters_multi,dedup_recall \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf30_dedup_r14_full.json \
  tools/run_main.sh -Xmx110g graft.Bench .localdata/sf30 \
  > BENCH_sf30_dedup_r14.json 2> /tmp/bench_sf30_r14.err
echo CHAIN_DONE
