#!/bin/bash
# Chip work queue: waits for the axon tunnel to recover (tiny-jit probe),
# then runs the queued TPU experiments sequentially, one process at a time
# (two processes competing for the chip is a known way to sicken the
# tunnel). Logs land in /tmp/chipq/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chipq

probe() {
  timeout 120 python -c "
import time, jax, jax.numpy as jnp
t0 = time.time()
jax.block_until_ready(jnp.sort(jnp.arange(1024)[::-1]))
print(f'probe ok {time.time()-t0:.1f}s')
" > /tmp/chipq/probe.log 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for tunnel..." >> /tmp/chipq/queue.log
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel still down" >> /tmp/chipq/queue.log
  sleep 300
done
echo "$(date -u +%H:%M:%S) TUNNEL UP: $(cat /tmp/chipq/probe.log)" \
  >> /tmp/chipq/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "$(date -u +%H:%M:%S) start $name" >> /tmp/chipq/queue.log
  timeout "$tmo" "$@" > "/tmp/chipq/$name.log" 2>&1
  echo "$(date -u +%H:%M:%S) done $name rc=$?" >> /tmp/chipq/queue.log
}

# 1. faceted breakdown + carry A/B (1M docs)
run exp_facet 7200 python scripts/exp_facet.py
# 2. config-3 ours row (reference row already in BASELINE.md)
run cfg3 7200 python scripts/config_bench.py --config 3 --skip-reference
# 3. config-4 ours row (reference leg measured separately: 54.07 qps)
run cfg4 7200 python scripts/config_bench.py --config 4 --skip-reference
# 4. headline bench sanity + tail re-measure
run bench 7200 python bench.py
# 5. concurrent REST serving row (ours on chip; ref leg runs separately)
run conc_ours 7200 python scripts/concurrent_bench.py --target ours
# 6. impact-prefix A/B on the 1M headline (VERDICT r2 stretch #10)
run bench_prefix16k 7200 env XT_PREFIX_CAP=16384 python bench.py
run bench_prefix8k 7200 env XT_PREFIX_CAP=8192 python bench.py
# 7. phrase-path breakdown (config-2 weak multiple)
run exp_phrase 7200 python scripts/exp_phrase.py
echo "$(date -u +%H:%M:%S) queue complete" >> /tmp/chipq/queue.log
