#!/bin/bash
# Round-5 artifact chain: serialized TPU jobs (one client at a time).
# Run AFTER the CPU scaling record so host timing noise stays out of it.
set -x
cd /root/repo
echo "=== bench_r1cs $(date)"
timeout 3600 python tools/bench_r1cs.py --batch 256 --json-out R1CS_BENCH.json
echo "r1cs exit=$?"
echo "=== bench_sweep $(date)"
timeout 5400 python tools/bench_sweep.py --batches 256,4096,8192,16384
echo "sweep exit=$?"
echo "=== bench.py $(date)"
timeout 3600 python bench.py --batch 4096
echo "bench exit=$?"
echo "=== done $(date)"
