"""LLM construction arguments.

Counterpart of the reference's pydantic arg system (`llmapi/llm_args.py:2762`
`TorchLlmArgs` + `KvCacheConfig` :1622 + `SchedulerConfig` :1460) — plain
dataclasses here; validation happens in __post_init__ and at engine build.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp

from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.quantization import KvCacheQuantAlgo, QuantAlgo, QuantConfig
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheConfig
from tensorrt_llm_tpu.runtime.scheduler import CapacitySchedulerPolicy, SchedulerConfig


@dataclass
class LlmArgs:
    model: Any = None                       # path | hf-config | ModelConfig
    tokenizer: Any = None                   # path | tokenizer object
    dtype: Any = jnp.bfloat16

    # parallelism
    tensor_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    data_parallel_size: int = 1
    context_parallel_size: int = 1          # sequence parallelism width
    context_parallel_type: str = "ulysses"  # ulysses | ring | helix | star
    moe_expert_parallel_size: int = 1
    # multi-host bring-up (one controller process per host): when set,
    # jax.distributed wires every host's chips into one device list before
    # the mesh builds — the reference's MPI world bootstrap
    # (llmapi/mpi_session.py) as the JAX distributed runtime.
    # dict(coordinator_address=..., num_processes=..., process_id=...)
    distributed_init: Optional[dict] = None

    # quantization
    quant_algo: Optional[str] = None        # e.g. "W4A16_AWQ"
    quant_group_size: int = 128
    kv_cache_quant: str = "NONE"
    # calibrated self-quantization: per-group clip search (see
    # quantization/calibrate.py)
    quant_clip_search: bool = False

    # engine limits
    max_batch_size: int = 64
    max_num_tokens: int = 2048
    max_seq_len: int = 2048

    # kv cache
    kv_cache_config: Optional[KVCacheConfig] = None
    kv_block_size: int = 16
    kv_num_blocks: Optional[int] = None
    free_mem_fraction: float = 0.85
    enable_block_reuse: bool = True
    # partial tail-block reuse + copy-on-partial-reuse (reference
    # KvCacheConfig enable_partial_reuse / copy_on_partial_reuse)
    enable_partial_reuse: bool = True
    copy_on_partial_reuse: bool = True
    # secondary host-memory KV tier: evicted reuse blocks offload to host
    # RAM and onboard back on a prefix hit (reference KvCacheConfig
    # host_cache_size / secondary pool).  0 = off.
    kv_host_cache_blocks: int = 0
    # only blocks with retention priority >= this offload to host
    # (reference secondary_offload_min_priority)
    kv_secondary_offload_min_priority: Optional[int] = None
    # pluggable external KV store: an object with save/load/contains
    # (reference kv_connector_config, LMCache-style connector plane)
    kv_connector: Optional[Any] = None

    # scheduler
    scheduler_policy: str = "guaranteed_no_evict"
    enable_chunked_prefill: bool = True
    # hold new prefills up to N iterations while the scheduled batch is
    # below ratio*max_num_tokens (reference batch_wait_timeout_iters /
    # batch_wait_max_tokens_ratio) — denser batches at high load
    batch_wait_timeout_iters: int = 0
    batch_wait_max_tokens_ratio: float = 0.0

    # attention: "auto" | "xla" | "pallas" | "sparse" (RocketKV-style
    # block-top-k long-context decode, reference
    # _torch/attention_backend/sparse/rocket.py)
    attention_backend: str = "auto"
    sparse_attention_topk_blocks: int = 64
    sparse_attention_sink_blocks: int = 1
    sparse_attention_recent_blocks: int = 2

    # LoRA: adapter directory merged into base weights at load
    lora_path: Optional[str] = None
    # runtime multi-LoRA: {adapter_name: peft_dir}; requests select adapters
    # via generate_async(..., lora_request=name)
    lora_adapters: Optional[dict] = None
    # paged PEFT cache (reference PeftCacheManager): keep at most this many
    # adapters resident on device, LRU-swapping the rest in from host on
    # demand.  None = all adapters resident.
    lora_max_device_adapters: Optional[int] = None
    # P-tuning prompt adapters (reference enable_prompt_adapter /
    # max_prompt_adapter_token): {name: [n, hidden] virtual-token
    # embedding table}; requests select one via
    # generate_async(..., prompt_adapter_request=name_or_array)
    prompt_adapters: Optional[dict] = None
    max_prompt_adapter_token: int = 64

    # speculative decoding
    speculative_config: Optional[Any] = None   # SpeculativeConfig

    # fused multi-step decode (1 disables).  8 measured best on v5e with
    # the chained-dispatch engine (tinyllama quick sweep, tok/s/chip:
    # k=1 38.8, k=4 118.2, k=8 309.8, k=16 256.9 — BENCH_E2E_r5 logs);
    # eos-stopping requests still cap at 4 (_decode_steps_for) so the
    # overshoot waste is bounded
    max_decode_steps: int = 8
    # overlap decode pipeline (reference disable_overlap_scheduler):
    # None = env default (TLLM_OVERLAP_DECODE / TLLM_OVERLAP_DEPTH)
    disable_overlap_scheduler: bool = False
    overlap_depth: Optional[int] = None
    # iteration-stats ring size (reference iter_stats_max_iterations)
    iter_stats_max_iterations: int = 1000

    # Wide-EP: rebalance expert placement every N iterations (0 = off)
    moe_rebalance_interval: int = 0
    # Wide-EP: extra physical expert slots the balancer fills with replicas
    # of hot experts (reference moeLoadBalancer redundant slots)
    moe_redundant_experts: int = 0

    # executor hang watchdog (reference pyexecutor/hang_detector.py); 0 = off
    watchdog_timeout: float = 300.0
    # precompile every decode/prefill/table bucket at startup (the CUDA-
    # graph capture analog).  None = auto: on for real TPU backends where a
    # mid-run compile stalls serving, off for CPU tests
    enable_warmup: Optional[bool] = None

    # iteration-window profiling: "start,stop" iteration numbers
    # (reference env TLLM_PROFILE_START_STOP, py_executor.py:63)
    profile_start_stop: Optional[str] = None

    # YAML overrides applied on top of constructor kwargs
    # (reference --extra_llm_api_options)
    extra_llm_api_options: Optional[str] = None

    # misc
    seed: int = 0
    skip_tokenizer_init: bool = False
    # "auto": read safetensors when present; "dummy": random-init at the
    # checkpoint's shapes without reading weights (reference load_format)
    load_format: str = "auto"
    enable_iter_perf_stats: bool = True
    # attach per-request timing/KV metrics to RequestOutput.metrics
    # (reference return_perf_metrics / RequestPerfMetrics)
    return_perf_metrics: bool = False
    # one host callable over the whole decode batch's logits
    # f(request_ids, token_id_lists, logits[B, V]) -> logits
    # (reference batched_logits_processor)
    batched_logits_processor: Optional[Any] = None
    # stream a result piece every N generated tokens (first token and
    # finish always emit — reference TorchLlmArgs.stream_interval,
    # py_executor.py:2743); >1 cuts per-token queue/SSE overhead at
    # high concurrency
    stream_interval: int = 1

    def __post_init__(self):
        if self.extra_llm_api_options:
            self.apply_yaml_overrides(self.extra_llm_api_options)

    def apply_yaml_overrides(self, path_or_dict):
        """Layer a YAML file (or dict) of field overrides onto this args
        object — the reference's `--extra_llm_api_options` escape hatch."""
        if isinstance(path_or_dict, dict):
            data = path_or_dict
        else:
            import yaml
            with open(path_or_dict) as f:
                data = yaml.safe_load(f) or {}
        for k, v in data.items():
            if not hasattr(self, k):
                raise ValueError(f"unknown LlmArgs field in overrides: {k!r}")
            setattr(self, k, v)

    def mapping(self) -> Mapping:
        ep = self.moe_expert_parallel_size
        return Mapping(
            tp_size=self.tensor_parallel_size,
            pp_size=self.pipeline_parallel_size,
            dp_size=self.data_parallel_size,
            cp_size=self.context_parallel_size,
            cp_type=self.context_parallel_type,
            moe_ep_size=ep,
            moe_tp_size=(self.tensor_parallel_size // ep if ep > 1 else 1),
        )

    def quant_config(self) -> Optional[QuantConfig]:
        if not self.quant_algo:
            return None
        return QuantConfig(
            quant_algo=QuantAlgo(self.quant_algo),
            kv_cache_quant_algo=KvCacheQuantAlgo(self.kv_cache_quant),
            group_size=self.quant_group_size,
            clip_search=self.quant_clip_search,
        )

    def make_kv_cache_config(self) -> KVCacheConfig:
        if self.kv_cache_config is not None:
            return self.kv_cache_config
        return KVCacheConfig(
            block_size=self.kv_block_size,
            num_blocks=self.kv_num_blocks,
            free_mem_fraction=self.free_mem_fraction,
            enable_block_reuse=self.enable_block_reuse,
            enable_partial_reuse=self.enable_partial_reuse,
            copy_on_partial_reuse=self.copy_on_partial_reuse,
            kv_quant=KvCacheQuantAlgo(self.kv_cache_quant),
            host_cache_blocks=self.kv_host_cache_blocks,
            secondary_offload_min_priority=(
                self.kv_secondary_offload_min_priority),
            kv_connector=self.kv_connector,
        )

    def make_scheduler_config(self) -> SchedulerConfig:
        return SchedulerConfig(
            policy=CapacitySchedulerPolicy(self.scheduler_policy),
            max_batch_size=self.max_batch_size,
            max_num_tokens=self.max_num_tokens,
            enable_chunked_prefill=self.enable_chunked_prefill,
            batch_wait_timeout_iters=self.batch_wait_timeout_iters,
            batch_wait_max_tokens_ratio=self.batch_wait_max_tokens_ratio,
        )
