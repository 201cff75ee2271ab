#!/bin/bash
# Serial TPU validation queue for the extended-precision subsystem.
#
# Runs every TPU job of the round back to back (this machine's relay
# inflates latencies several-fold under concurrency — serialize), each
# detach-safe with its own log. Launch detached:
#
#   nohup bash benchmarks/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout 3000 "$@" > "/tmp/tpu_${name}.log" 2>&1
  echo "=== $name exit $? ($(date -u +%H:%M:%S))"
  tail -20 "/tmp/tpu_${name}.log" | grep -v "WARNING\|cpu_aot" || true
}

run eft_probe     python -u benchmarks/eft_tpu_probe.py
run ext_bench     python -u benchmarks/extended_sweep_bench.py --no-oracle
run bench         python -u bench.py
run explore_loop  python -u benchmarks/exploration_loop.py
run smoke         python -u scripts/tpu_smoke.py
echo "=== queue done ($(date -u +%H:%M:%S))"
