#!/bin/bash
# Round-16 post-canon threshold ladder (VERDICT r15 next-#4): r15
# attributed the canon tier's 0.572 marker-regime recall to the
# MinEstJaccard=0.5 emission gate vs the 0.2 truth bar — a
# comment-shaped assertion until measured. Run dedup_recall_canon at
# sf10 once per gate rung; each JSON line carries the rung
# (min_est_jaccard) plus recall AND n_cand, so the committed artifact is
# the recall-vs-candidate-growth curve the claim needs (linear n_cand
# growth in the cold bucket space, or honestly not).
# Also serves VERDICT r15 next-#6: the 0.5 run IS the isolated
# ONLY-repro of the canon tier (16-101 s band spread attribution).
# Do NOT compile or run sbt while this runs (bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
for t in 0.5 0.4 0.3 0.2; do
  SPARK_GRAFT_MIN_EST_JACCARD=$t \
    tools/run_main.sh -Xmx96g graft.DedupRecallProbe .localdata/sf10 dedup_recall_canon \
    > /tmp/canon_thresh_${t}.json 2> /tmp/canon_thresh_${t}.err
done
python3 - <<'EOF'
import json
rows = []
for t in ["0.5", "0.4", "0.3", "0.2"]:
    with open(f"/tmp/canon_thresh_{t}.json") as f:
        rows.append(json.loads(f.read().strip()))
with open("DEDUPRECALL_sf10canon_thresh_r16.json", "w") as f:
    f.write(json.dumps({"metric": "dedup_recall_canon_threshold_ladder",
                        "dir": ".localdata/sf10", "rungs": rows}) + "\n")
EOF
echo CANON_THRESH_DONE
