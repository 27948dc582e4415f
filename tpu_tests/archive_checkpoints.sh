#!/bin/bash
# Archive every committed rolling checkpoint (last-<step>) of the quality
# suite runs as a hardlink copy under <run>/checkpoints/archive/ BEFORE the
# TopKCheckpointManager GC removes it (save_last keeps only the newest).
#
# Purpose (round 4): a full every-checkpoint ladder enables honest
# validation-split checkpoint SELECTION (e.g. best-val-MI) on top of the
# loss-monitor selection the reference uses — without touching the training
# path of the in-flight suite. Hardlinks cost no disk; orbax never rewrites
# files in place, so linked trees stay immutable. Only the directory named
# by last_step.json (the post-save commit point) is archived, so a copy can
# never race a half-written checkpoint.
#
# Usage: nohup bash tpu_tests/archive_checkpoints.sh [run_dir...] \
#            >/tmp/ckpt_archive.log 2>&1 &
#        echo $! > /tmp/ckpt_archive.pid
#   run_dir args default to runs/q3_* and runs/q4_*; ONCE=1 does a single
#   pass instead of the 20s-poll daemon loop.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
if [ $# -gt 0 ]; then RUNS=("$@"); else RUNS=("$REPO"/runs/q3_* "$REPO"/runs/q4_*); fi
while true; do
  for run in "${RUNS[@]}"; do
    [ -d "$run/checkpoints" ] || continue
    js="$run/checkpoints/last_step.json"
    [ -f "$js" ] || continue
    path=$(python3 -c "import json,sys;print(json.load(open(sys.argv[1]))['path'])" "$js" 2>/dev/null) || continue
    name=$(basename "$path")
    dest="$run/checkpoints/archive/$name"
    if [ -d "$path" ] && [ ! -d "$dest" ]; then
      mkdir -p "$run/checkpoints/archive"
      cp -al "$path" "$dest.tmp" && mv "$dest.tmp" "$dest" \
        && echo "$(date -u +%H:%M:%S) archived $name <- $run"
    fi
  done
  [ "${ONCE:-}" = "1" ] && break
  sleep 20
done
