#!/bin/bash
# Round-13 probes (VERDICT r12 #5 and #6), run AFTER bench_chain_r13.sh:
#
# 1. PQ production constants: PqK=256 (PqM stays 8) via the env knob —
#    occupancy, the recall ladder, and the ADC/rerank floors at sf1, so
#    the "production would raise it to 256 — one constant" claim carries
#    numbers. embedding_pq_codes is NOT run at PqK=256 (8×8-bit packed
#    codes need 64 bits — its loud require; the probe tiers never touch
#    the packed column).
#
# 2. approx_distinct sf10 floor regression (2.68 → 5.41 s, r12's only
#    one): the ONLY-triple reproduction isolating it with its band
#    neighbors from the quantile rework, min-of-3.
#
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
SPARK_GRAFT_PQ_K=256 tools/run_main.sh -Xmx96g graft.PqStats .localdata/sf1 \
  > PQSTATS_sf1_pqk256_r13.json 2> /tmp/pqstats_pqk256.err
SPARK_GRAFT_PQ_K=256 tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf1 \
  > RECALL_sf1_pqk256_r13.json 2> /tmp/recall_pqk256.err
SPARK_GRAFT_PQ_K=256 SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_ONLY=ann_pq,ann_pq_rerank,pq_occupancy,ann_recall \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf1_pqk256_r13_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf1 \
  > BENCH_sf1_pqk256_r13.json 2> /tmp/bench_pqk256.err
SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_ONLY=agg_quantiles,approx_distinct,approx_quantiles \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf10_adistinct_r13_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_adistinct_r13.json 2> /tmp/bench_adistinct.err
echo PROBES_DONE
