#!/bin/bash
# One-command TPU-return sequence (the session runbook automated):
# run the moment `python -c "import jax; print(jax.devices())"` shows the
# real chip.  Each stage logs to benchmarks/tpu_return_logs/ and later
# stages run even if earlier ones fail (every number is independently
# valuable).  Total budget ~30-45 min on v5e through the tunnel.
#
#   bash benchmarks/tpu_return.sh            # full sequence
#   bash benchmarks/tpu_return.sh quick      # smoke first (short e2e)
set -u
cd "$(dirname "$0")/.."
LOGS=benchmarks/tpu_return_logs
mkdir -p "$LOGS"
QUICK="${1:-}"

run() {  # run <name> <timeout-s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== [$name] $*" | tee -a "$LOGS/summary.txt"
  timeout "$to" "$@" 2>&1 | tee "$LOGS/$name.log" | tail -20
  local rc=${PIPESTATUS[0]}
  echo "[$name] exit=$rc $(date -u +%H:%M:%S)" | tee -a "$LOGS/summary.txt"
  return "$rc"
}

# 0. chip sanity (fail fast if the tunnel is flapping)
run chip 120 python -c "import jax; d=jax.devices(); assert d[0].platform!='cpu', d; print(d)" || exit 1

# 1. kernel-variant probes (VERDICT #1: mixed native-s4 feed is the big
#    lever; ramp kills the cold-DMA; tuning sweeps per-shape blocks)
run variants 900 python -m benchmarks.probe_w4a16_variants
run ramp 900 python -m benchmarks.probe_w4a16_ramp
run tuning 1200 python -m benchmarks.probe_w4a16_tuning --quick

# 2. Mosaic lowering validation of interpret-only kernels at small shapes
#    (int8 paged decode / int8 flash prefill / packed D<128 / MLA / DSA /
#    grouped-MoE mixed): each has an env kill-switch if it fails.
run kernel_validate 1200 python -m pytest \
  tests/test_int8_kv.py tests/test_paged_attention.py \
  tests/test_flash_prefill.py tests/test_moe_quant.py -q -x

# 3. THE driver metric: bench.py autotunes (incl. mixed/ramp tactics) and
#    prints the W4A16 %HBM-roofline JSON line. Target: value >= 85.0.
run bench 1800 python bench.py

# 4. e2e tokens/s/chip (VERDICT #2) -> BENCH_E2E_r2.json
if [ "$QUICK" = "quick" ]; then
  run e2e 1800 python benchmarks/bench_e2e.py --quick
else
  run e2e_quick 1200 python benchmarks/bench_e2e.py --quick --out /tmp/e2e_smoke.json
  run e2e 3600 python benchmarks/bench_e2e.py
fi

echo "=== DONE — review $LOGS/summary.txt; if bench >= 85 commit" \
     "BENCH_E2E_r2.json + autotuner cache + PARITY.md MFU table ==="
