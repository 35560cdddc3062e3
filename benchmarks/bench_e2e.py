"""End-to-end tokens/s/chip benchmark -> BENCH_E2E_r2.json (VERDICT #2).

Runs trtllm-tpu-bench on the real chip for BASELINE.json configs #3/#4
(TinyLlama-1.1B W4A16; Llama-3-8B-shaped W4A16 + INT8 KV, TP=1) at the
reference's headline ISL/OSL 1000/1000
(`/root/reference/docs/source/developer-guide/perf-overview.md:63-67` —
tables are "output tokens/sec per GPU"), recording throughput plus
TTFT/TPOT percentiles.

Usage: python benchmarks/bench_e2e.py [--out BENCH_E2E_r2.json] [--quick]
"""

from __future__ import annotations

import argparse
import json
import time


def run_config(name: str, argv: list) -> dict:
    from tensorrt_llm_tpu.commands import bench
    import gc
    import io
    import contextlib

    buf = io.StringIO()
    t0 = time.time()
    # cleanup BEFORE building too: a failed previous config's engine is
    # pinned by its exception traceback until the caller's handler exits,
    # so the in-finally cleanup below could not free it yet
    import jax as _jax
    gc.collect()
    _jax.clear_caches()
    gc.collect()
    try:
        with contextlib.redirect_stdout(buf):
            bench.main(argv)
    finally:
        # configs share one process: drop the previous engine's device
        # buffers (params, pools, jit executables) before the next builds
        # or the next free-mem sizing sees a full device and the build
        # dies RESOURCE_EXHAUSTED
        import jax
        gc.collect()
        jax.clear_caches()
        gc.collect()
    out = buf.getvalue()
    # the report is the last JSON object printed
    report = json.loads(out[out.index("{"):])
    report["config"] = name
    report["bench_wall_s"] = round(time.time() - t0, 1)
    print(f"[{name}] {report.get('output_tokens_per_sec_per_chip', '?')} "
          f"tok/s/chip (wall {report['bench_wall_s']}s)", flush=True)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_E2E_r2.json")
    ap.add_argument("--quick", action="store_true",
                    help="reduced request count for smoke runs")
    ap.add_argument("--isl", type=int, default=1000)
    ap.add_argument("--osl", type=int, default=1000)
    ap.add_argument("--configs", default=None,
                    help="comma-separated substrings: run matching configs")
    ap.add_argument("--decode-steps", type=int, default=None,
                    help="forwarded to the bench CLI (1 = single-step "
                         "decode, no fused scan)")
    args = ap.parse_args()

    n = 8 if args.quick else 32
    conc = 8 if args.quick else 16
    common = ["--isl", str(args.isl), "--osl", str(args.osl),
              "--num-requests", str(n), "--concurrency", str(conc),
              "--max-seq-len", str(args.isl + args.osl + 64)]

    reports = []

    def flush():
        # incremental write: a wall-clock cutoff mid-run keeps earlier configs
        with open(args.out, "w") as f:
            json.dump({"isl": args.isl, "osl": args.osl,
                       "reports": reports}, f, indent=2)
        print(f"wrote {args.out} ({len(reports)} configs)", flush=True)

    configs = [
        # config #3 first: the smallest bring-up (VERDICT r3 #1 — land a
        # number before anything big compiles)
        ("tinyllama-1.1b-w4a16",
         ["throughput", "--model", "tinyllama-1.1b", "--quant", "W4A16",
          "--max-batch-size", str(conc), *common]),
        ("llama-3-8b-w4a16",
         ["throughput", "--model", "llama-3-8b", "--quant", "W4A16",
          "--max-batch-size", str(conc), *common]),
        # config #4 (TP=1 slice): Llama-3-8B shapes, W4A16 + INT8 KV
        ("llama-3-8b-w4a16-int8kv",
         ["throughput", "--model", "llama-3-8b", "--quant", "W4A16",
          "--kv-dtype", "int8", "--max-batch-size", str(conc), *common]),
        # reference headline single-chip model: GPT-OSS 20B (MoE + sinks +
        # sliding windows; perf-overview.md:121-132 tables)
        ("gpt-oss-20b-w4a16",
         ["throughput", "--model", "gpt-oss-20b", "--quant", "W4A16",
          "--max-batch-size", str(conc), *common]),
    ]
    wanted = (args.configs.split(",") if args.configs else None)
    for name, argv in configs:
        if wanted and not any(w in name for w in wanted):
            continue
        if args.decode_steps:
            argv = argv + ["--decode-steps", str(args.decode_steps)]
        try:
            reports.append(run_config(name, argv))
        except Exception as e:  # noqa: BLE001 — don't lose earlier numbers
            print(f"[{name}] FAILED: {e}", flush=True)
        flush()


if __name__ == "__main__":
    main()
