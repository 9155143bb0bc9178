#!/bin/bash
# Round-14 follow-up probes, run AFTER bench_chain_r14b.sh:
#
# 1. The EXACT-duplicate-dense regime for the dedup recall harness:
#    DEDUPRECALL_sf10_r14 measured the union tier at 0.193 on MARKER
#    near-dup replicas — the regime where full-signature grouping
#    cannot see most replica pairs. The cap defense ("hot buckets are
#    exact-dup territory, owned by the signature grouping") describes
#    mirror-spam: byte-identical copies. ScaleData's `exact` mode
#    builds that corpus (10× byte-identical replicas of sf1); the
#    probe measures whether union recall actually closes there.
#
# 2. knn_join's sf10 ladder miss (0.667 at the 4-bit demo constant):
#    re-measure at the production constant PqK=256 to attribute it —
#    quantization resolution (K=256 closes it) or probe miss (it
#    doesn't).
#
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
tools/run_main.sh -Xmx96g graft.ScaleData .localdata/sf1 .localdata/sf10x 10 exact \
  2> /tmp/scaledata_sf10x.err
tools/run_main.sh -Xmx96g graft.DedupRecallProbe .localdata/sf10x \
  > DEDUPRECALL_sf10exact_r14.json 2> /tmp/dedup_recall_sf10x.err
SPARK_GRAFT_PQ_K=256 tools/run_main.sh -Xmx96g graft.RecallProbe .localdata/sf10 \
  > RECALL_sf10_pqk256_r14.json 2> /tmp/recall_sf10_pqk256_r14.err
echo PROBES_DONE
