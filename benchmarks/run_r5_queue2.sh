#!/bin/bash
# Round-5 chip queue, part 2 — waits for part 1's bash (pid arg) to exit,
# then runs strictly sequentially on the single-tenant chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "=== q2 job 1: kirag_batched int8-KV ONLY $(date)"
BENCH_MODES=batched BENCH_KV_BITS=8 \
  timeout 3600 python benchmarks/bench_kirag_batched.py

echo "=== q2 job 2: kirag_batched prefix-cache ONLY $(date)"
BENCH_MODES=batched BENCH_PREFIX_GROUPS=8 \
  timeout 3600 python benchmarks/bench_kirag_batched.py

echo "=== q2 job 3: probe_r8 capdom tail attribution $(date)"
timeout 5400 python benchmarks/probe_r8.py

echo "=== q2 job 4: bench_spec_loop measured-acceptance KiRAG loop $(date)"
timeout 5400 python benchmarks/bench_spec_loop.py

echo "=== q2 job 5: probe_r7 int8_8m attribution $(date)"
PROBE_PART=int8_8m timeout 5400 python benchmarks/probe_r7.py

echo "=== q2 job 6: probe_r7 int4_21m attribution $(date)"
PROBE_PART=int4_21m timeout 7200 python benchmarks/probe_r7.py

echo "=== q2 done $(date)"
