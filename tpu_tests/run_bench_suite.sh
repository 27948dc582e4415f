#!/bin/bash
# Round-2 bench suite: canonical gan, reuse_g fast mode, patch mode.
# Run only when the chip is otherwise idle.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== gan canonical (batch4 accum2) ==="
BENCH_BATCH=4 BENCH_ACCUM=2 python bench.py
echo "=== gan + reuse_g_forward ==="
BENCH_BATCH=4 BENCH_ACCUM=2 BENCH_REUSE_G=1 python bench.py
echo "=== patch+perceptual mode ==="
BENCH_MODE=patch BENCH_BATCH=4 BENCH_ACCUM=2 python bench.py
