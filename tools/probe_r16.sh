#!/bin/bash
# Round-16 probe phase 1 — the two-level-quantizer evidence (VERDICT r15
# next-#1 and next-#7):
#
# 1. RecallProbe at sf1 + sf10: the ladder over the NEW two-level graph
#    cells. The done-bar is knn_mutual_rerank recall staying 1.0 at sf10
#    (r15: 1.000 over the flat capped cells) — the quantizer change moves
#    the graph's candidate sets, so the exact re-rank tier is the recall
#    regression gate.
# 2. The sf30 graph-family probe (same ONLY list as r15's): the fix's
#    headline number. r15 cold build 402.8 s at sf30 vs 41.3 s at sf10
#    (x9.8 for 3x data, past the KmMaxK ceiling); the done-bar is
#    sf30 cold ~ 3x the sf10 cold (~120 s, not 400).
# 3. The matching sf10 run so 2's ratio is same-session, same-replica.
#
# Requires .localdata/{sf1,sf10,sf30} (survived the container this
# round). Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf1 \
  > RECALL_sf1_r16.json 2> /tmp/recall_sf1_r16.err
tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf10 \
  > RECALL_sf10_r16.json 2> /tmp/recall_sf10_r16.err
SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_ONLY=bpe_merges,bpe_vocab,knn_join,knn_mutual_pairs,knn_mutual_rerank,dedup_semantic_graph \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf10_new_r16_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_new_r16.json 2> /tmp/bench_sf10_new_r16.err
SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_ONLY=bpe_merges,bpe_vocab,knn_join,knn_mutual_pairs,knn_mutual_rerank,dedup_semantic_graph \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf30_new_r16_full.json \
  tools/run_main.sh -Xmx110g graft.Bench .localdata/sf30 \
  > BENCH_sf30_new_r16.json 2> /tmp/bench_sf30_new_r16.err
echo PROBES_PHASE1_DONE
