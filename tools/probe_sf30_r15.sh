#!/bin/bash
# Round-15 sf30 probe (VERDICT r14 next-#7): extend the two new
# corpus-linear families to a third decade — BPE (train + apply) and
# the kNN graph (build + mutual pairs + exact re-rank + the graph-fed
# SemDeDup tier). Requires .localdata/sf30 (make_replicas_r15.sh).
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_ONLY=bpe_merges,bpe_vocab,knn_join,knn_mutual_pairs,knn_mutual_rerank,dedup_semantic_graph \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf30_new_r15_full.json \
  tools/run_main.sh -Xmx110g graft.Bench .localdata/sf30 \
  > BENCH_sf30_new_r15.json 2> /tmp/bench_sf30_r15.err
echo SF30_DONE
