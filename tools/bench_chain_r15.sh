#!/bin/bash
# Round-15 chain, leg $1 (a..f) — full-catalog floors at the 138-query
# HEAD (knn_mutual_rerank, dedup_recall_canon, dedup_semantic_graph and
# bpe_vocab joined the 134; ann_recall ladders knn_mutual_rerank; the
# kNN graph checkpoint moved to corpusScaled per ADVICE r14). Legs a-c
# run all three scales; d-f are sf0.1-only (the 6-sample floor power
# VERDICT r14 next-#4 asked for, at the scale where 6 full legs fit the
# round's wall clock). Replicas are THIS round's generation
# (tools/make_replicas_r15.sh) — cross-round floors compare per-query
# mins only.
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
LEG="${1:?usage: bench_chain_r15.sh <a|b|c|d|e|f>}"
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf0.1_r15${LEG}_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > BENCH_sf0.1_r15${LEG}.json 2> /tmp/bench_sf01_r15${LEG}.err
case "$LEG" in a|b|c)
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf1_r15${LEG}_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_r15${LEG}.json 2> /tmp/bench_sf1_r15${LEG}.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_FULL=BENCH_sf10_r15${LEG}_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_r15${LEG}.json 2> /tmp/bench_sf10_r15${LEG}.err
;; esac
echo "CHAIN_${LEG}_DONE"
