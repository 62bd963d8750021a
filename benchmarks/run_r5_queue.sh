#!/bin/bash
# Round-5 chip job queue — strictly sequential (single-tenant chip; keep the
# host idle during measurement windows). Each job bounded by timeout.
# Usage: nohup bash benchmarks/run_r5_queue.sh >> /tmp/r5_queue.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== job 1: bench_train packed A/B remat=dots $(date)"
BENCH_PACKED=1 BENCH_REMAT=dots timeout 3600 python benchmarks/bench_train.py

echo "=== job 2: kirag_batched levers kv8+prefix8 $(date)"
BENCH_MODES=batched BENCH_KV_BITS=8 BENCH_PREFIX_GROUPS=8 \
  timeout 3600 python benchmarks/bench_kirag_batched.py

echo "=== job 3: kirag_batched same-session control (no levers) $(date)"
BENCH_MODES=batched timeout 3600 python benchmarks/bench_kirag_batched.py

echo "=== job 4: decode 8B int8 weights + int8 KV at long prompt $(date)"
timeout 3600 python benchmarks/bench_decode_quant.py \
  --geometry 8b --bits 8 --batch 8 --new 64 --prompt 1920 --kv_bits 8

echo "=== job 5: bench_train packed remat=full $(date)"
BENCH_PACKED=1 BENCH_REMAT=full timeout 3600 python benchmarks/bench_train.py

echo "=== queue done $(date)"
