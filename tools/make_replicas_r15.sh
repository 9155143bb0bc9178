#!/bin/bash
# Rebuild the gitignored .localdata replicas for round 15 (they do not
# survive container resets; cross-session sf1/sf10 floors compare only
# through per-query mins — bench protocol).
cd "$(dirname "$0")/.." || exit 1
set -x
tools/run_main.sh -Xmx48g graft.ScaleData /root/testdata/sf0.1 .localdata/sf1 10 \
  2> /tmp/scaledata_sf1.err
tools/run_main.sh -Xmx96g graft.ScaleData .localdata/sf1 .localdata/sf10 10 \
  2> /tmp/scaledata_sf10.err
tools/run_main.sh -Xmx96g graft.ScaleData .localdata/sf1 .localdata/sf10x 10 exact \
  2> /tmp/scaledata_sf10x.err
tools/run_main.sh -Xmx96g graft.ScaleData .localdata/sf10 .localdata/sf30 3 \
  2> /tmp/scaledata_sf30.err
echo REPLICAS_DONE
