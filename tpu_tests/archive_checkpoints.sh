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
# Usage: nohup bash tpu_tests/archive_checkpoints.sh >/tmp/ckpt_archive.log 2>&1 &
#        echo $! > /tmp/ckpt_archive.pid
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
while true; do
  for run in "$REPO"/runs/q3_*; do
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
  sleep 20
done
