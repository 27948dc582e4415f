#!/bin/bash
# Round-3 chip backlog: one command that captures everything queued behind
# the TPU relay outage (docs/ROUND6_NOTES.md), in priority order, resumable.
#
# Usage:  bash tpu_tests/chip_queue.sh [stage...]
#   with no args runs every stage that has not yet completed; stage names
#   can be given to (re)run a subset. Completion markers + logs live in
#   tpu_tests/chip_queue_logs/.
#
# Priority rationale (highest value per chip-minute first):
#   1 bench      — the official strict+fast artifact (VERDICT r2 item 1);
#                  validates BENCH_r03.json will parse at round end.
#   2 profile    — fresh post-routing profile of the strict step (item 2).
#   3 quality    — the 128^3 quality suite on the round-3 fixture, n=20
#                  (item 4): canonical, then the patch/no-perceptual A/B.
#   4 perf_ab    — attack-list A/Bs: ci1 tap-reduce Pallas wgrad, hbm peak
#                  recalibration (item 2 leftovers).
#   5 train256   — on-chip 256^3 training demo (item 9).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOGS=tpu_tests/chip_queue_logs
mkdir -p "$LOGS"

run_stage() {
    local name="$1" budget="$2"; shift 2
    if [[ -e "$LOGS/$name.done" && $# -eq 0 ]]; then
        echo "== $name: already done, skipping"; return 0
    fi
    echo "== $name (budget ${budget}s) -> $LOGS/$name.log"
    if timeout "$budget" bash -c "$CMD" >"$LOGS/$name.log" 2>&1; then
        touch "$LOGS/$name.done"
        echo "== $name: OK"
    else
        echo "== $name: FAILED rc=$? (see $LOGS/$name.log)"
    fi
}

want() {  # no args given -> run all; else only named stages
    [[ ${#STAGES[@]} -eq 0 ]] && return 0
    local s; for s in "${STAGES[@]}"; do [[ "$s" == "$1" ]] && return 0; done
    return 1
}

STAGES=("$@")

if want bench; then
    CMD='BENCH_BUDGET_S=1500 python bench.py'
    run_stage bench 1600
fi

if want profile; then
    # fresh post-routing strict-step profile + its physical-byte budget
    # (nonconv_budget.py joins /tmp/minipig_profile_step with the HLO dump
    # attribute_ops.py writes to /tmp/step_hlo.txt)
    CMD='python tpu_tests/profile_step.py step && python tpu_tests/attribute_ops.py && python tpu_tests/nonconv_budget.py'
    run_stage profile 2400
fi

if want quality; then
    # ~3h: canonical 1250 steps (~70 min) + patch 1100 + patch_noperc 1100.
    CMD='python examples/run_quality_suite.py'
    run_stage quality 14400
fi

if want perf_ab; then
    CMD='python tpu_tests/hbm_peak.py && python tpu_tests/wgrad_formulations.py'
    run_stage perf_ab 1800
fi

if want taps_major; then
    # concatenate.177 attack, 3-way A/B on the strict step:
    #   base        — taps-minor [vox,27] im2col (27->128 lane padding)
    #   taps-major  — [27,vox] stack, vox in lanes (set_ci1_taps_major)
    #   pallas      — single-pass tap-reduce kernel, no patch matrix at all
    CMD='BENCH_SEMANTICS=strict BENCH_BUDGET_S=500 python bench.py && \
         BENCH_SEMANTICS=strict BENCH_BUDGET_S=500 BENCH_CI1_TAPS_MAJOR=1 python bench.py && \
         BENCH_SEMANTICS=strict BENCH_BUDGET_S=500 BENCH_CI1_PALLAS=1 python bench.py'
    run_stage taps_major 1800
fi

if want train256; then
    CMD='python tpu_tests/train_256_experiment.py'
    run_stage train256 1800
fi

if want train256_sweep; then
    # round-3 follow-up: all three 256^3+remat programs crash the relay's
    # remote-compile helper (HTTP 500 / exit 1). Sweep intermediate sizes
    # to find the infra ceiling and record the largest single-chip-
    # trainable volume (all sizes divisible by 8 for the 3x stride-2
    # cascade).
    CMD='EXP_SPATIAL=160,192,224,256 python tpu_tests/train_256_experiment.py'
    run_stage train256_sweep 5400
fi

echo "== chip queue pass complete"
