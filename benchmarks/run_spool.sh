#!/bin/bash
# Single-tenant chip job spool: executes /tmp/r5_jobs/*.sh in lexical order,
# one at a time. Append jobs by dropping numbered scripts into the spool.
# Arg 1 (optional): pid to wait for before starting (earlier queue).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5_jobs /tmp/r5_jobs/done

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

while true; do
  job=$(ls /tmp/r5_jobs/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    sleep 20
    continue
  fi
  echo "=== spool: $job $(date)"
  bash "$job"
  echo "=== spool done: $job rc=$? $(date)"
  mv "$job" /tmp/r5_jobs/done/
done
