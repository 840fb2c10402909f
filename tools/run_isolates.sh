#!/bin/bash
# Round-11 regression attribution: interleaved fresh-process arms.
#   A = r10 graded tree WITH the INDEX_WARMED warm-up (bench conditions)
#   B = r10 graded tree, warm-up DISABLED (the in-repo-suspect control)
#   C = r9 graded tree (old code; r9 bench had no index warm-up)
# Two interleaved passes of 4 runs each -> 8 pooled runs per entry per arm.
set -u
OUT=/tmp/isolates_r11.jsonl
: > "$OUT"
cd /tmp
for pass in 1 2; do
  for spec in "r10warm /tmp/r10tree 1" "r10cold /tmp/r10tree 0" "r9 /tmp/r9tree 0"; do
    set -- $spec
    echo "=== pass $pass arm $1 $(date +%T)" >> "$OUT.log"
    python /tmp/isolate_arm.py "$2" "${1}_p${pass}" "$3" 4 >> "$OUT" 2>> "$OUT.log"
  done
done
echo DONE_ALL_ARMS >> "$OUT"
