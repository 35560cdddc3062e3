#!/bin/bash
# Post-bench chip queue: mosaic sweep -> kernel bench -> quant agreement.
cd /root/repo
export PYTHONPATH="$PYTHONPATH:/root/repo"
echo "=== mosaic sweep"
timeout 3000 python benchmarks/mosaic_sweep.py --out benchmarks/MOSAIC_SWEEP.json > benchmarks/tpu_return_logs/r5_mosaic.log 2>&1
echo "rc=$?"
echo "=== kernel bench"
timeout 1800 python bench.py > benchmarks/tpu_return_logs/r5_bench_kernel.log 2>&1
echo "rc=$?"
echo "=== quant agreement"
timeout 1800 python benchmarks/eval_quant_agreement.py --out EVAL_QUANT_r5.json > benchmarks/tpu_return_logs/r5_quant_agree.log 2>&1
echo "rc=$?"
