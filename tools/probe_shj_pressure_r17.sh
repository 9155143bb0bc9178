#!/bin/bash
# Round-17 controlled-pressure A/B for the AQE runtime SMJ->SHJ rewrite
# (VERDICT r16 next-#2; guide §3.1/§5). r16's loaded-hour A/B showed the
# SMJ sort's spill cliff is real (tfidf_topk 3x under pressure) but host
# luck is not a measurement. Pressure here is CONTROLLED: the local-mode
# JVM heap is the executor memory, so -Xmx$PRESSURE_G creates real
# execution-memory pressure at sf10 while -Xmx96g is the quiet control.
# Arms: threshold unset (Spark default 0 = rewrite off) vs
# SPARK_GRAFT_SHJ_THRESHOLD=$THRESH (runtime-gated SMJ->SHJ only where
# every post-shuffle partition fits). Join-heavy ONLY list from the r16
# A/B plus wordcount as control. reps=2, same host, arms interleaved.
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
ONLY=tfidf_topk,text_dedup_token_spans,dedup_chunk_minhash,q5_revenue,ngram_novelty,decontaminate_fuzzy,dedup_minhash_lsh,wordcount
THRESH="${SPARK_GRAFT_SHJ_AB_THRESH:-256m}"
PRESSURE_G="${SPARK_GRAFT_SHJ_AB_PRESSURE:-8}"
set -x
# quiet control pair (96g): the conf must cost nothing here
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/tmp/shj_quiet_def_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > /tmp/shj_quiet_def.json 2> /tmp/shj_quiet_def.err
SPARK_GRAFT_SHJ_THRESHOLD=$THRESH \
  SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/tmp/shj_quiet_shj_full.json \
  tools/run_main.sh -Xmx96g graft.Bench .localdata/sf10 \
  > /tmp/shj_quiet_shj.json 2> /tmp/shj_quiet_shj.err
# sf0.1 quiet pair: at small scale EVERY post-shuffle partition fits
# under the threshold, so the runtime rewrite fires on every SMJ — the
# worst case for a quiet-path tax; the conf may not cost anything here
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/tmp/shj_sf01_def_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > /tmp/shj_sf01_def.json 2> /tmp/shj_sf01_def.err
SPARK_GRAFT_SHJ_THRESHOLD=$THRESH \
  SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/tmp/shj_sf01_shj_full.json \
  tools/run_main.sh graft.Bench /root/testdata/sf0.1 \
  > /tmp/shj_sf01_shj.json 2> /tmp/shj_sf01_shj.err
# pressure pair: same binary, same hour, heap constrained
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/tmp/shj_press_def_full.json \
  tools/run_main.sh -Xmx${PRESSURE_G}g graft.Bench .localdata/sf10 \
  > /tmp/shj_press_def.json 2> /tmp/shj_press_def.err
SPARK_GRAFT_SHJ_THRESHOLD=$THRESH \
  SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  SPARK_GRAFT_BENCH_FULL=/tmp/shj_press_shj_full.json \
  tools/run_main.sh -Xmx${PRESSURE_G}g graft.Bench .localdata/sf10 \
  > /tmp/shj_press_shj.json 2> /tmp/shj_press_shj.err
echo SHJ_AB_DONE
