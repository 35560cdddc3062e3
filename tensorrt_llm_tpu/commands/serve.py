"""`trtllm-tpu-serve` — OpenAI-compatible serving CLI.

Counterpart of the reference's `trtllm-serve` (commands/serve.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    import sys
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    if argv and argv[0] == "disaggregated":
        return main_disaggregated(argv[1:])
    p = argparse.ArgumentParser("trtllm-tpu-serve")
    p.add_argument("model", help="HF checkpoint path")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--max-batch-size", type=int, default=64)
    p.add_argument("--max-num-tokens", type=int, default=2048)
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.add_argument("--quant", default=None,
                   help="W4A16 | W4A16_AWQ | W4A16_GPTQ | W8A16")
    p.add_argument("--kv-block-size", type=int, default=16)
    p.add_argument("--served-model-name", default=None)
    p.add_argument("--tool-parser", default=None,
                   help="function-call parser family: qwen3 | deepseek_v3 "
                        "| harmony (reference serve/tool_parser/)")
    p.add_argument("--reasoning-parser", default=None,
                   help="split <think> blocks into reasoning_content: "
                        "deepseek-r1 | qwen3 | nano-v3 (reference "
                        "llmapi/reasoning_parser.py)")
    p.add_argument("--register-to", default=None,
                   help="disagg front-end base URL to join on startup")
    p.add_argument("--advertise-url", default=None,
                   help="this worker's URL as seen by the front end")
    p.add_argument("--disagg-role", default="generation",
                   choices=["context", "generation"])
    p.add_argument("--extra-llm-api-options", default=None,
                   help="YAML file with LlmArgs overrides")
    p.add_argument("--mm-encoder-only", action="store_true",
                   help="serve only the multimodal encoder "
                        "(/v1/mm_embeddings — EPD disagg encode stage, "
                        "reference mm_encoder_only)")
    args = p.parse_args(argv)

    from tensorrt_llm_tpu.llmapi import LLM, MultimodalEncoder
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    cls = MultimodalEncoder if args.mm_encoder_only else LLM
    llm = cls(
        model=args.model,
        tensor_parallel_size=args.tp_size,
        max_batch_size=args.max_batch_size,
        max_num_tokens=args.max_num_tokens,
        max_seq_len=args.max_seq_len,
        quant_algo=args.quant,
        kv_block_size=args.kv_block_size,
        extra_llm_api_options=args.extra_llm_api_options,
    )
    server = OpenAIServer(
        llm, args.served_model_name or args.model,
        tool_parser=args.tool_parser,
        reasoning_parser=args.reasoning_parser,
        register_to=args.register_to,
        advertise_url=args.advertise_url
        or f"http://{args.host}:{args.port}",
        disagg_role=args.disagg_role)
    server.run(args.host, args.port)


def main_disaggregated(argv):
    """`trtllm-tpu-serve disaggregated` — the two-pool front end
    (reference: trtllm-serve disaggregated, serve/openai_disagg_server.py)."""
    p = argparse.ArgumentParser("trtllm-tpu-serve disaggregated")
    p.add_argument("--ctx-servers", nargs="*", default=[],
                   help="context (prefill) worker base URLs (more may "
                        "join at runtime via /register)")
    p.add_argument("--gen-servers", nargs="*", default=[],
                   help="generation (decode) worker base URLs")
    p.add_argument("--router", default="round_robin",
                   choices=["round_robin", "load_based", "kv_aware"])
    p.add_argument("--health-interval", type=float, default=5.0,
                   help="seconds between worker health sweeps (0 = off)")
    p.add_argument("--conditional-max-prompt", type=int, default=0,
                   help="prompts up to this many tokens skip the remote "
                        "prefill hop (conditional disaggregation)")
    p.add_argument("--conditional-cached-fraction", type=float, default=0.0,
                   help="skip the prefill hop when a decode worker caches "
                        "at least this fraction of the prompt")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)

    from tensorrt_llm_tpu.serve.disagg_server import OpenAIDisaggServer
    OpenAIDisaggServer(
        args.ctx_servers, args.gen_servers, args.router,
        health_interval=args.health_interval,
        conditional_max_prompt=args.conditional_max_prompt,
        conditional_cached_fraction=args.conditional_cached_fraction,
    ).run(args.host, args.port)


if __name__ == "__main__":
    main()
