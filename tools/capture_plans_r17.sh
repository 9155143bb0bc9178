#!/bin/bash
# Capture formatted plans for named queries into plans/r17/<q>_<tag>.txt
# with Catalyst expression/plan ids NORMALIZED (ADVICE r16 #1: ids
# renumber across capture sessions, so raw captures falsify
# "plan identical" claims that are structurally true; with ids stripped,
# identical-plan claims are mechanically checkable with cmp/diff).
#   tools/capture_plans_r17.sh <tag> <query> [query...]
# Optional: BINDIR=/tmp/r15head to capture from an old-HEAD worktree.
cd "$(dirname "$0")/.." || exit 1
TAG="${1:?usage: capture_plans_r17.sh <tag> <query>...}"; shift
BINDIR="${BINDIR:-.}"
mkdir -p plans/r17
OUT=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  "$BINDIR"/tools/run_main.sh graft.Explain "$@" 2>/dev/null)
for q in "$@"; do
  printf '%s\n' "$OUT" \
    | awk -v q="$q" '$0=="===== "q" =====",($0 ~ /^===== / && $0!="===== "q" ====="){print}' \
    | sed -E 's/#[0-9]+L?//g; s/\[plan_id=[0-9]+\]//g; s/@[0-9a-f]{6,}//g; s/^===== .* =====$//' \
    > "plans/r17/${q}_${TAG}.txt"
  echo "wrote plans/r17/${q}_${TAG}.txt ($(wc -l < "plans/r17/${q}_${TAG}.txt") lines)"
done
