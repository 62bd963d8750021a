#!/bin/bash
# Round-5 chip queue, part 3 — waits for part 2's bash (pid arg).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== q3 job 1: bench_pq_1m recall/qps ladder $(date)"
timeout 7200 python benchmarks/bench_pq_1m.py
echo "=== q3 done $(date)"
