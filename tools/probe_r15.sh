#!/bin/bash
# Round-15 probes — run BEFORE the bench legs (they are the round's
# headline evidence), AFTER tools/make_replicas_r15.sh has rebuilt
# .localdata (replicas do not survive container resets).
#
# 1. Post-canon dedup recall (VERDICT r14 next-#1): DedupRecallProbe now
#    emits the dedup_recall_canon tiers (post_canon_lsh/post_canon_sig)
#    alongside the raw tiers — at sf1, sf10 (marker near-dup replicas)
#    and sf10x (byte-identical mirror-spam replicas, the regime the
#    pipeline-order claim is really about).
# 2. The graph re-rank recall (next-#2): RecallProbe's ladder now has a
#    knn_mutual_rerank tier — recall above knn_join's raw 0.667 at sf10
#    is the number that justifies small-K PQ serving + exact re-rank.
# 3. (ann_ivfpq attribution moved to tools/probe_ivfpq_ab_r15.sh —
#    the same-host r13-HEAD A/B needs its own quiet window.)
# 4. The 24-batch attributed stream replay (guards added this round).
#
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
tools/run_main.sh -Xmx96g graft.DedupRecallProbe .localdata/sf1 \
  > DEDUPRECALL_sf1_r15.json 2> /tmp/dedup_recall_sf1_r15.err
tools/run_main.sh -Xmx96g graft.DedupRecallProbe .localdata/sf10 \
  > DEDUPRECALL_sf10_r15.json 2> /tmp/dedup_recall_sf10_r15.err
tools/run_main.sh -Xmx96g graft.DedupRecallProbe .localdata/sf10x \
  > DEDUPRECALL_sf10exact_r15.json 2> /tmp/dedup_recall_sf10x_r15.err
tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf1 \
  > RECALL_sf1_r15.json 2> /tmp/recall_sf1_r15.err
tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf10 \
  > RECALL_sf10_r15.json 2> /tmp/recall_sf10_r15.err
SPARK_GRAFT_PQ_K=256 tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf1 \
  > RECALL_sf1_pqk256_r15.json 2> /tmp/recall_pqk256_r15.err
# ---- 24-batch incremental-dedup + attribution stream replay ----
SPARK_GRAFT_STREAM_BATCHES=24 tools/run_main.sh -Xmx48g graft.StreamBench /root/testdata/sf0.1 \
  > BENCH_stream_r15.json 2> /tmp/stream_r15.err
echo PROBES_DONE
