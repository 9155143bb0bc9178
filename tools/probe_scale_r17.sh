#!/bin/bash
# Round-17 core-scaling probe (VERDICT r16 next-#1): per-query evidence
# that the heavy operators actually parallelize with cores at a
# compute-bound SF. Top-25 queries by sf10 six-leg floor (plus wordcount
# as the scan-bound control), run at sf10 with SPARK_GRAFT_CPUS=32 and
# =8 on the same host back-to-back, reps=2 (min-of-reps floors). The
# harness honors SPARK_GRAFT_CPUS for BOTH master and shuffle
# parallelism (EngineSession.local), so the ratio is a true core-scaling
# measurement, not a partition-count artifact.
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
ONLY=dedup_clusters_multi,dedup_recall,text_dedup_token_spans,dedup_minhash_lsh,dedup_recall_canon,ann_recall,window_running,bpe_pair_counts,embedding_kmeans,decontaminate_fuzzy,ngram_novelty,curation_dsir,ann_lsh_multiprobe,decontaminate_bloom,quality_perplexity,token_stats,dedup_minhash,curation_budget,agg_grouping_sets,dedup_clusters,bpe_vocab,tfidf_topk,source_overlap,dedup_canonical,ann_ivfpq,wordcount
set -x
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf10_c32_r17_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_c32_r17.json 2> /tmp/bench_sf10_c32_r17.err
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf10_c8_r17_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_c8_r17.json 2> /tmp/bench_sf10_c8_r17.err
echo SCALE_PROBE_DONE
