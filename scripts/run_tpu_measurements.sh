#!/bin/bash
# Round-3 int8/b1-fold measurement batch. Run from /root/repo with
# PYTHONPATH unset (axon TPU). Each step bounded; logs to /tmp.
set -x
cd /root/repo

echo "=== 1. int8 MXU microbench ==="
timeout 1200 python scripts/profile_int8_mxu.py 2>&1 | tail -20

echo "=== 2. concat kernel variants (base / b1fold / int8) ==="
timeout 1800 python scripts/profile_fusion_kernels.py concat_variants 2>&1 | tail -20

echo "=== 2b. gated int8 kernel ==="
timeout 1800 python scripts/profile_fusion_kernels.py gated_int8 2>&1 | tail -8

echo "=== 3. e2e int8 vs bf16 flagship ==="
timeout 2400 python scripts/bench_int8.py 2>&1 | tail -20

echo "=== 4. headline bench (b1-folded default) ==="
timeout 2400 python bench.py 2>/tmp/bench_headline_err.log | tail -3
tail -5 /tmp/bench_headline_err.log

echo "=== 5. gated at-scale 1M-item row (last session's failed run) ==="
timeout 3600 python scripts/bench_scale.py --fusion gated --n_items 1000000 \
    2>&1 | tail -12
