#!/bin/bash
# Round-2 probe driver: each probe in its own process with a hard timeout
# (some program shapes have wedged the remote compiler for >40 min).
# Results append to benchmarks/probe_r2_results.jsonl as they land.
cd "$(dirname "$0")/.." || exit 1
OUT=benchmarks/probe_r2_results.jsonl
PROBES="${PROBES:-exact_onehot_262k exact_onehot_524k matmul_only topk_12800 topk_8192 topk_2048 gather_groups onehot_gather baseline_exact exact_onehot_1m exact_onehot_262k_q1024 pallas_gmax_8192 pallas_gmax_32768}"
for p in $PROBES; do
  echo "=== $(date +%H:%M:%S) probe $p" >> benchmarks/probe_r2.log
  timeout 1500 python benchmarks/probe_r2.py --probe "$p" >> "$OUT" 2>> benchmarks/probe_r2.log
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"probe\": \"$p\", \"ok\": false, \"error\": \"driver rc=$rc (timeout=124)\"}" >> "$OUT"
  fi
done
echo "=== $(date +%H:%M:%S) all probes done" >> benchmarks/probe_r2.log
