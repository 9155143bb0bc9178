#!/bin/bash
# Round-17 bpe apply-chain scale re-check (VERDICT r16 next-#5): is the
# N=12 chained-replace constant the dominant term for the three BPE
# consumers at sf30? Measures bpe_merges (trainer), bpe_vocab,
# bpe_encode, pack_sequences_bpe and the non-BPE pack_sequences baseline
# at sf10 AND sf30, same session generation, reps=2.
# Prereq: .localdata/sf30 exists (tools/make_replicas: ScaleData sf10 x3).
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
ONLY=bpe_merges,bpe_vocab,bpe_encode,pack_sequences_bpe,pack_sequences,wordcount
set -x
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf10_bpe_r17_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > BENCH_sf10_bpe_r17.json 2> /tmp/bench_sf10_bpe_r17.err
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=BENCH_sf30_bpe_r17_full.json \
  tools/run_main.sh -Xmx110g graft.Bench .localdata/sf30 \
  > BENCH_sf30_bpe_r17.json 2> /tmp/bench_sf30_bpe_r17.err
echo BPE_SF30_DONE
