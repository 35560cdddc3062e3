"""The LLM user API.

Counterpart of the reference's `tensorrt_llm/llmapi/llm.py` (`LLM` :1171,
`generate`/`generate_async` :266,351): loads tokenizer + checkpoint, builds the
engine/executor, exposes sync + async generation with streaming.

Single-controller design: no MPI proxy/worker processes — one Python process
drives the whole TPU slice through jax.distributed (multi-host lands with the
serving stack), so submission is a function call instead of ZMQ IPC.
"""

from __future__ import annotations

import os
import queue
from dataclasses import dataclass, field
from typing import Any, Iterator, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.llmapi.llm_args import LlmArgs
from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.runtime.executor import PyExecutor
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import FinishReason, LlmRequest
from tensorrt_llm_tpu.utils import cdiv, logger


@dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: List[int]
    finish_reason: Optional[str] = None
    logprobs: Optional[list] = None
    cumulative_logprob: Optional[float] = None
    # np [num_output_tokens, V], when return_generation_logits was set
    generation_logits: Optional[Any] = None


@dataclass
class RequestOutput:
    request_id: int
    prompt: Optional[str]
    prompt_token_ids: List[int]
    outputs: List[CompletionOutput] = field(default_factory=list)
    finished: bool = False
    # top-N logprobs per prompt position (entry 0 is None), when
    # SamplingParams.prompt_logprobs was set
    prompt_logprobs: Optional[list] = None
    # np [prompt_len, V], when return_context_logits was set
    context_logits: Optional[Any] = None
    # per-request timing/KV metrics, when LlmArgs.return_perf_metrics
    # (reference RequestPerfMetrics)
    metrics: Optional[dict] = None


class LLM:
    def __init__(self, model: Any = None, tokenizer: Any = None,
                 args: Optional[LlmArgs] = None, **kwargs):
        if args is None:
            args = LlmArgs(model=model, tokenizer=tokenizer, **kwargs)
        self.args = args
        self._tokenizer = None
        self._build()

    # ------------------------------------------------------------------ build ----
    def _load_tokenizer(self, model_path: Optional[str]):
        if self.args.skip_tokenizer_init:
            return None
        tok = self.args.tokenizer
        if tok is None and model_path is not None:
            tok = model_path
        if isinstance(tok, (str, os.PathLike)):
            from transformers import AutoTokenizer
            return AutoTokenizer.from_pretrained(tok)
        return tok

    def _build(self):
        a = self.args
        from tensorrt_llm_tpu.utils.common import enable_compilation_cache
        enable_compilation_cache()
        if a.distributed_init is not None:
            # multi-host: join the jax.distributed world before any device
            # use so the mesh spans every host's chips
            from tensorrt_llm_tpu.parallel.mesh import initialize_distributed
            initialize_distributed(**a.distributed_init)
        mapping = a.mapping()
        quant = a.quant_config()

        model_path = None
        if isinstance(a.model, ModelConfig):
            cfg = a.model
            cfg.mapping = mapping
            if quant is not None:
                cfg.quant = quant
            params = None
        elif isinstance(a.model, (str, os.PathLike)):
            model_path = str(a.model)
            from transformers import AutoConfig
            hf_cfg = AutoConfig.from_pretrained(model_path)
            if quant is None:
                # pre-quantized HF checkpoint (AWQ/GPTQ): adopt its config so
                # LLM(model=awq_dir) just works (reference linear.py:1618-1692)
                from tensorrt_llm_tpu.quantization.hf_ingest import (
                    quant_config_from_hf)
                hq = quant_config_from_hf(
                    getattr(hf_cfg, "quantization_config", None))
                if hq is not None:
                    from tensorrt_llm_tpu.quantization import (
                        QuantAlgo as _QA, QuantConfig as _QC)
                    kwargs = dict(quant_algo=_QA(hq["algo"]),
                                  group_size=hq["group_size"],
                                  has_zero_point=True,
                                  pre_quantized=True,
                                  ckpt_format=hq["format"],
                                  ckpt_v2=hq["v2"])
                    if hq["exclude_modules"]:
                        kwargs["exclude_modules"] = tuple(
                            hq["exclude_modules"]) + ("embed",)
                    quant = _QC(**kwargs)
                    logger.info("adopting %s quantization_config "
                                "(group_size=%d) from checkpoint",
                                hq["format"], hq["group_size"])
            cfg = ModelConfig.from_hf_config(hf_cfg, quant=quant,
                                             mapping=mapping, dtype=a.dtype)
            params = None
        else:
            raise TypeError(f"model must be path or ModelConfig, got {type(a.model)}")
        cfg.max_position = max(cfg.max_position, a.max_seq_len)
        if a.moe_redundant_experts:
            cfg.moe_redundant_experts = a.moe_redundant_experts
        cfg.attention_backend = a.attention_backend
        if a.attention_backend == "sparse" and cfg.sparse_attention is None:
            # RocketKV-style block-top-k decode (reference sparse backends)
            cfg.sparse_attention = {
                "topk_blocks": a.sparse_attention_topk_blocks,
                "sink_blocks": a.sparse_attention_sink_blocks,
                "recent_blocks": a.sparse_attention_recent_blocks,
            }
        if cfg.sparse_attention is not None:
            assert mapping.cp_size == 1, \
                "sparse attention: no context parallelism"
            if cfg.sparse_attention.get("algo") == "dsa":
                assert cfg.is_mla, "DSA sparse attention rides MLA layers"
            else:
                assert not cfg.is_mla, \
                    "block-top-k sparse attention: GQA layers only " \
                    "(MLA models use the DSA indexer)"

        self.model_config = cfg
        self._tokenizer = self._load_tokenizer(model_path)

        model_cls = get_model_class(cfg.architecture)
        self.model = model_cls(cfg)

        def _random_init():
            """Random-init at the real shapes.  On an accelerator, init on
            the HOST then ship final arrays once: device-side init stacks
            per-layer bf16/f32 quantize transients on top of the growing
            final params and OOMs big models (r5: GPT-OSS-20B ~12.5 GB
            final died in init on the 16 GB chip)."""
            if jax.default_backend() == "cpu" or mapping.world_size > 1:
                return self.model.init(jax.random.PRNGKey(a.seed))
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                p = self.model.init(jax.random.PRNGKey(a.seed))
                p = jax.tree.map(lambda x: x.block_until_ready(), p)
            return jax.device_put(p, jax.devices()[0])

        if a.load_format == "dummy":
            # reference load_format="dummy": skip the checkpoint read and
            # random-init at the real shapes (perf/bring-up runs)
            params = _random_init()
        elif model_path is not None and _has_weights(model_path):
            get_tensor = _safetensors_reader(model_path)
            if a.lora_path:
                from tensorrt_llm_tpu.lora import load_lora_adapter, merge_lora_into_state
                get_tensor = merge_lora_into_state(
                    get_tensor, load_lora_adapter(a.lora_path))
            import inspect
            kw = {}
            if "placer" in inspect.signature(
                    self.model.load_hf_weights).parameters:
                kw["placer"] = self._make_param_placer(mapping, a)
            params = self.model.load_hf_weights(get_tensor, dtype=a.dtype,
                                                **kw)
        elif params is None:
            logger.warning("no checkpoint found — random-initializing weights")
            params = _random_init()

        if getattr(model_cls, "is_encoder", False):
            # BERT-class encoder (embeddings / reranking): one bidirectional
            # forward, no KV cache or autoregressive executor
            from tensorrt_llm_tpu.models.bert import EncoderRunner
            self.encoder = EncoderRunner(self.model, params,
                                         max_seq_len=a.max_seq_len)
            self.executor = None
            self.engine = None
            self.kv_manager = None
            self.moe_balancer = None
            return

        self.lora_manager = None
        if a.lora_adapters:
            from tensorrt_llm_tpu.lora.multi_lora import (
                MultiLoraManager, PagedMultiLoraManager)
            self.lora_manager = MultiLoraManager.from_paths(
                a.lora_adapters, cfg)
            if a.lora_max_device_adapters and \
                    a.lora_max_device_adapters < len(a.lora_adapters):
                self.lora_manager = PagedMultiLoraManager(
                    self.lora_manager.adapters, cfg,
                    a.lora_max_device_adapters)
            params = self.lora_manager.attach(params, cfg.dtype)

        kvcfg = a.make_kv_cache_config()
        if cfg.is_mla:
            kvcfg.layout = "latent"
        if cfg.sparse_attention is not None:
            from tensorrt_llm_tpu.quantization.mode import KvCacheQuantAlgo
            assert kvcfg.kv_quant == KvCacheQuantAlgo.NONE, \
                "sparse attention requires unquantized KV pools"
            if cfg.sparse_attention.get("algo") == "dsa":
                kvcfg.dsa_index_dim = int(
                    cfg.sparse_attention.get("index_head_dim", 128))
            else:
                kvcfg.sparse_kt = True
        num_blocks = kvcfg.num_blocks or self._derive_num_blocks(
            cfg, kvcfg, a, params)
        if mapping.cp_size > 1 and mapping.cp_type == "helix":
            from tensorrt_llm_tpu.runtime.kv_cache_manager import (
                HelixKVCacheManager)
            self.kv_manager = HelixKVCacheManager(
                kvcfg, cfg.num_layers, cfg.kv_pool_heads, cfg.kv_pool_dim,
                num_blocks, mapping.cp_size)
        elif mapping.cp_size > 1 and mapping.cp_type == "star":
            from tensorrt_llm_tpu.runtime.kv_cache_manager import (
                StarKVCacheManager)
            assert a.speculative_config is None, \
                "speculative decoding under star CP lands later"
            self.kv_manager = StarKVCacheManager(
                kvcfg, cfg.num_layers, cfg.kv_pool_heads, cfg.kv_pool_dim,
                num_blocks, mapping.cp_size)
        elif mapping.dp_size > 1:
            from tensorrt_llm_tpu.runtime.kv_cache_manager import (
                DpKVCacheManager)
            self.kv_manager = DpKVCacheManager(
                kvcfg, cfg.num_layers, cfg.kv_pool_heads, cfg.kv_pool_dim,
                num_blocks, mapping.dp_size)
        else:
            self.kv_manager = KVCacheManager(
                kvcfg, cfg.num_layers, cfg.kv_pool_heads, cfg.kv_pool_dim,
                num_blocks)

        self.engine = ModelEngine(
            self.model, params, self.kv_manager, mapping=mapping,
            max_batch_size=a.max_batch_size, max_seq_len=a.max_seq_len)
        if hasattr(self.lora_manager, "bind_engine"):
            self.lora_manager.bind_engine(self.engine)

        eos = None
        if self._tokenizer is not None:
            eos = self._tokenizer.eos_token_id
        drafter = None
        if a.speculative_config is not None:
            from tensorrt_llm_tpu.speculative import get_drafter
            drafter = get_drafter(a.speculative_config, a)
        self.moe_balancer = None
        if cfg.num_experts > 0:
            from tensorrt_llm_tpu.runtime.moe_load_balancer import (
                MoeLoadBalancer)
            self.moe_balancer = MoeLoadBalancer(
                self.model, self.engine, interval=a.moe_rebalance_interval)
        do_warmup = a.enable_warmup
        if do_warmup is None:
            from tensorrt_llm_tpu.utils import is_tpu_backend
            do_warmup = is_tpu_backend()
        if do_warmup:
            # compile every bucket a request can reach before serving
            # starts (the CUDA-graph capture analog): a mid-run compile
            # over a slow link stalls every in-flight request
            self.engine.warmup(multi_steps=a.max_decode_steps)
        self.executor = PyExecutor(
            self.engine, a.make_scheduler_config(), eos_token_id=eos,
            max_seq_len=a.max_seq_len, max_decode_steps=a.max_decode_steps,
            drafter=drafter, tokenizer=self._tokenizer,
            vocab_size=cfg.vocab_size,
            watchdog_timeout=a.watchdog_timeout,
            profile_start_stop=a.profile_start_stop,
            moe_balancer=self.moe_balancer,
            overlap_decode=(False if a.disable_overlap_scheduler else None),
            overlap_depth=a.overlap_depth,
            iter_stats_max_iterations=a.iter_stats_max_iterations,
            batched_logits_processor=a.batched_logits_processor)
        self.executor.start()
        # Join the executor loop at interpreter exit even when the user's
        # script raises without calling shutdown(): a daemon thread killed
        # mid-XLA-call aborts the process with "FATAL: exception not
        # rethrown" (glibc forced unwind out of a pthread wait).
        # weakref.finalize registers an atexit hook that runs before
        # daemon-thread teardown and is idempotent with shutdown().
        import weakref
        self._exit_finalizer = weakref.finalize(
            self, PyExecutor.shutdown, self.executor)

    def _make_param_placer(self, mapping, a):
        """Streaming sharded weight load (VERDICT r2 #5): a callback
        load_hf_weights applies to each completed layer so its host f32
        staging is committed to the final (mesh-sharded) device placement
        immediately and freed — peak host memory ~one layer, and no rank
        ever materializes the whole unsharded model.  ModelEngine's later
        device_put with identical shardings is then a no-op.  Reference
        capability: per-rank checkpoint loaders
        (_torch/pyexecutor/model_loader.py:182)."""
        if mapping.pp_size > 1 or a.lora_adapters:
            # PP slices layers across stage sub-meshes after load; LoRA
            # attaches host-side deltas to loaded leaves — both need the
            # un-placed tree
            return None
        mesh = None
        specs = None
        if mapping.world_size > 1:
            from tensorrt_llm_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(mapping)
            specs = self.model.param_specs()

        def place(path, sub):
            if sub is None:
                return None
            if mesh is None:
                return jax.device_put(sub)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from tensorrt_llm_tpu.runtime.model_engine import prune_specs
            node = specs
            for k in path:
                node = node[k]
            pruned = prune_specs(node, sub)
            sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pruned,
                              is_leaf=lambda x: isinstance(x, P))
            return jax.device_put(sub, sh)

        return place

    @staticmethod
    def _derive_num_blocks(cfg, kvcfg, a, params=None) -> int:
        """Size the pool from device free memory (reference
        resource_manager.py:782 calculate_max_num_blocks)."""
        from tensorrt_llm_tpu.quantization.mode import KvCacheQuantAlgo
        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit", 8 << 30)
            used = stats.get("bytes_in_use", 0)
            # async dispatch: freshly created/uploaded weights may not be
            # committed device-side yet, so bytes_in_use under-reports and
            # the pool overshoots HBM (r5: every 8B+ bench config died
            # RESOURCE_EXHAUSTED).  Floor `used` at the params footprint.
            if params is not None:
                pbytes = sum(getattr(l, "nbytes", 0)
                             for l in jax.tree.leaves(params))
                used = max(used, pbytes)
            budget = int((limit - used) * kvcfg.free_mem_fraction)
        except Exception:
            budget = 4 << 30
        tp = cfg.mapping.tp_size
        heads = (1 if cfg.is_mla
                 else max(cfg.kv_pool_heads // tp, 1))
        n = KVCacheManager.blocks_from_memory(
            budget, cfg.num_layers, heads, cfg.kv_pool_dim, kvcfg.block_size,
            num_pools=1 if cfg.is_mla else 2,
            extra_dims=(kvcfg.dsa_index_dim
                        + (cfg.kv_pool_dim if kvcfg.sparse_kt else 0)),
            scale_pools=kvcfg.kv_quant != KvCacheQuantAlgo.NONE)
        # at least enough for max_batch_size sequences of max_seq_len
        need = a.max_batch_size * cdiv(a.max_seq_len, kvcfg.block_size)
        return min(max(n, 64), max(need * 2, 64) * 8)

    # ------------------------------------------------------------------ weights ---
    def update_weights(self, source) -> None:
        """Hot-swap model weights at runtime (RLHF rollout support —
        reference /update_weights endpoint, serve/openai_server.py:290 +
        llmapi/rlhf_utils.py).  `source` is a checkpoint directory or a
        get_tensor(name) callable; shapes/architecture must match."""
        import os as _os
        if isinstance(source, (str, _os.PathLike)):
            get_tensor = _safetensors_reader(str(source))
        elif callable(source):
            get_tensor = source
        else:
            raise TypeError("source must be a path or get_tensor callable")
        params = self.model.load_hf_weights(get_tensor, dtype=self.args.dtype)
        self.engine.update_params(params)

    def release_memory(self) -> None:
        """Page model weights out of device HBM (RLHF rollout support —
        reference /release_memory endpoint + _torch/virtual_memory.py).
        Refuses while requests are in flight; generate() after release
        requires resume_memory() first."""
        import time as _time
        ex = self.executor
        # close the submit door FIRST: a request submitted between the
        # emptiness checks and the flag set would decode against weights
        # being paged out.  Re-open on refusal.
        ex.weights_released = True   # submit() refuses until resume
        try:
            # finished requests linger in `active` for an iteration while
            # the overlap pipeline's trailing chunks drain — wait for true
            # idle, but refuse immediately if anything is generating
            deadline = _time.time() + 5.0
            while True:
                if any(not r.is_finished for r in ex.active) or ex.waiting \
                        or not ex.request_queue.empty():
                    raise RuntimeError("cannot release weight memory with "
                                       "requests in flight")
                if not ex.active:
                    break
                if _time.time() > deadline:
                    raise RuntimeError("executor did not drain finished "
                                       "requests in time")
                _time.sleep(0.01)
        except Exception:
            ex.weights_released = False
            raise
        self.engine.release_weight_memory()

    def resume_memory(self) -> None:
        """Re-upload weights released by release_memory (reference
        /resume_memory)."""
        self.engine.resume_weight_memory()
        self.executor.weights_released = False

    def rebalance_experts(self) -> dict:
        """Recompute + install Wide-EP expert placement from live load stats
        (reference moe_load_balancer.py)."""
        assert self.moe_balancer is not None, "model has no MoE layers"
        return self.moe_balancer.rebalance()

    # ------------------------------------------------------------------ generate --
    def generate(
        self,
        prompts: Union[str, Sequence[str], Sequence[List[int]], List[int]],
        sampling_params: Union[SamplingParams, Sequence[SamplingParams], None] = None,
        use_tqdm: bool = False,
    ) -> List[RequestOutput]:
        import numbers
        single = isinstance(prompts, str) or (
            isinstance(prompts, (list, tuple)) and prompts
            and isinstance(prompts[0], numbers.Integral))
        if single:
            prompts = [prompts]
        n = len(prompts)
        if sampling_params is None:
            sampling_params = SamplingParams()
        sps = ([sampling_params] * n if isinstance(sampling_params, SamplingParams)
               else list(sampling_params))
        futures = [self.generate_async(p, sp) for p, sp in zip(prompts, sps)]
        results = [f.result() for f in futures]
        return results

    def generate_async(self, prompt, sampling_params: Optional[SamplingParams] = None,
                       streaming: bool = False,
                       disaggregated_params=None,
                       lora_request: Optional[str] = None,
                       prompt_adapter_request=None,
                       cache_salt: Optional[str] = None,
                       kv_retention_priority: Optional[int] = None,
                       priority: float = 0.5,
                       ) -> "GenerationFuture":
        sampling_params = sampling_params or SamplingParams()
        if sampling_params.n > 1 and not sampling_params.use_beam_search:
            # parallel sampling (OpenAI `n`): n independent samples of the
            # same prompt as sibling requests — the prefix-reuse tree
            # shares the prompt KV blocks between them (reference returns
            # n sequences per request the same way)
            if streaming:
                raise ValueError("streaming with n > 1 is not supported; "
                                 "use n futures or beam search")
            import dataclasses as _dc
            subs = []
            for j in range(sampling_params.n):
                sp_j = _dc.replace(
                    sampling_params, n=1,
                    seed=(sampling_params.seed + j
                          if sampling_params.seed is not None else None))
                subs.append(self.generate_async(
                    prompt, sp_j, streaming=False,
                    disaggregated_params=disaggregated_params,
                    lora_request=lora_request,
                    prompt_adapter_request=prompt_adapter_request,
                    cache_salt=cache_salt,
                    kv_retention_priority=kv_retention_priority,
                    priority=priority))
            return _FanoutFuture(subs)
        prompt_embeds = None
        mm_extra = None
        mm_hash = None
        if isinstance(prompt, dict) and "multi_modal_embeddings" in prompt:
            # EPD disagg: a separate encoder stage (MultimodalEncoder /
            # /v1/mm_embeddings) already ran the vision tower — accept its
            # payload directly, skipping encode here (reference
            # mm_encoder_only + prompt["multi_modal_embeddings"],
            # serve/openai_server.py:566-571)
            mme = prompt["multi_modal_embeddings"]
            token_ids = [int(t) for t in mme["token_ids"]]
            text = prompt.get("prompt")
            prompt_embeds = np.asarray(mme["embeds"], np.float32)
            mm_extra = mme.get("extra") or None
            mm_hash = mme.get("mm_hash")
        elif isinstance(prompt, dict):
            (token_ids, text, prompt_embeds,
             mm_extra, mm_hash) = self._process_mm_prompt(prompt)
        elif isinstance(prompt, str):
            assert self._tokenizer is not None, "tokenizer required for text prompts"
            token_ids = self._tokenizer.encode(prompt)
            text = prompt
        else:
            token_ids = [int(t) for t in prompt]
            text = None
        if (sampling_params.prompt_logprobs
                or sampling_params.return_context_logits) and (
                getattr(self.engine, "_star", False)
                or getattr(self.engine, "_helix", False)):
            # star/helix CP prefill returns rank-combined single-row logits;
            # full prompt rows are not available — fail loudly instead of
            # silently returning nothing
            raise ValueError("prompt_logprobs / return_context_logits are "
                             "not supported under star/helix context "
                             "parallelism")
        pa_hash = None
        if prompt_adapter_request is not None:
            # P-tuning prompt adapter (reference enable_prompt_adapter /
            # PromptAdapterRequest, max_prompt_adapter_token): learned
            # virtual-token embeddings prepended to the prompt in
            # embedding space; positions shift naturally with length
            if prompt_embeds is not None:
                raise ValueError("prompt adapters cannot combine with "
                                 "multimodal prompts")
            pa = prompt_adapter_request
            if isinstance(pa, str):
                table = (self.args.prompt_adapters or {}).get(pa)
                if table is None:
                    raise ValueError(f"unknown prompt adapter {pa!r}; pass "
                                     "prompt_adapters={name: array} to LLM")
                pa_hash = f"name:{pa}"
                pa = table
            virt = np.asarray(pa, np.float32)
            if virt.ndim != 2 or virt.shape[1] != self.model.cfg.hidden_size:
                raise ValueError(f"prompt adapter must be [n, hidden_size];"
                                 f" got {virt.shape}")
            if virt.shape[0] > self.args.max_prompt_adapter_token:
                raise ValueError(
                    f"{virt.shape[0]} virtual tokens > "
                    f"max_prompt_adapter_token="
                    f"{self.args.max_prompt_adapter_token}")
            emb = self.engine.params.get("embedding")
            if emb is None:
                raise ValueError("model has no token-embedding table "
                                 "(prompt adapters unsupported for it)")
            text_emb = np.asarray(emb["weight"], np.float32)[
                np.asarray(token_ids, np.int32)]
            mult = getattr(self.model.cfg, "embedding_multiplier", None)
            if mult:
                text_emb = text_emb * float(mult)
            prompt_embeds = np.concatenate([virt, text_emb], axis=0)
            token_ids = [0] * virt.shape[0] + token_ids
            if pa_hash is None:
                import hashlib
                pa_hash = hashlib.sha256(virt.tobytes()).hexdigest()[:16]
        rtype = "full"
        if disaggregated_params is not None:
            rtype = disaggregated_params.request_type
            if rtype == "context_only":
                # copy-on-clamp: the params object may be shared across the
                # caller's batch (same invariant as executor.submit)
                import dataclasses as _dc2
                sampling_params = _dc2.replace(sampling_params, max_tokens=1)
        # Fold everything that changes KV content for the same token ids into
        # the prefix-reuse identity (reference BlockKey{tokens, loraTaskId,
        # mm hashes, salt}, kvCacheManager.h:148-195): user salt, LoRA
        # adapter name, multimodal content hash.
        salt_parts = [] if cache_salt is None else [f"user:{cache_salt}"]
        if lora_request is not None:
            salt_parts.append(f"lora:{lora_request}")
        if mm_hash is not None:
            salt_parts.append(f"mm:{mm_hash}")
        if pa_hash is not None:
            salt_parts.append(f"pa:{pa_hash}")
        req = LlmRequest(token_ids, sampling_params, request_type=rtype,
                         disagg_params=disaggregated_params,
                         lora_request=lora_request,
                         cache_salt="|".join(salt_parts) or None,
                         retention_priority=kv_retention_priority,
                         priority=priority)
        req.stream_interval = max(1, self.args.stream_interval)
        if lora_request is not None:
            assert self.lora_manager is not None, \
                "pass lora_adapters={name: path} to LLM to enable multi-LoRA"
            if hasattr(self.lora_manager, "acquire"):
                # paged PEFT cache: pin the adapter's device slot for the
                # request's lifetime (swap-in on miss)
                req.lora_slot = self.lora_manager.acquire(lora_request)
                mgr = self.lora_manager
                req.on_finished = lambda r, n=lora_request: mgr.release(n)
            else:
                req.lora_slot = self.lora_manager.slot_of(lora_request)
        if prompt_embeds is not None:
            req.prompt_embeds = prompt_embeds
        if mm_extra:
            if mm_extra.get("prefill_pair_mask") is not None \
                    and self.engine.mapping.dp_size > 1:
                # the pair-mask prefill path has no attention-DP owner
                # banding: every rank would scatter into its own pool shard
                raise ValueError(
                    "custom-visibility (bidirectional image span) prefill "
                    "is not supported under attention-DP")
            req.mrope_positions = mm_extra.get("mrope_positions")
            req.mrope_delta = mm_extra.get("mrope_delta", 0)
            req.prefill_pair_mask = mm_extra.get("prefill_pair_mask")
            # Mllama: per-request cross-attention state (vision K/V source)
            req.cross_states = mm_extra.get("cross_states")
            req.cross_image_start = mm_extra.get("cross_image_start", 0)
        self.executor.submit(req)
        return GenerationFuture(self, req, text, streaming)

    def _process_mm_prompt(self, prompt: dict):
        """Multimodal prompt schema (reference inputs/registry.py):
        {"prompt" | "prompt_token_ids", "multi_modal_data": {"image": [...],
        "audio": [...], "video": [...]}} -> (token_ids, text, prompt_embeds,
        mm_extra, mm_hash)."""
        inner = prompt.get("prompt_token_ids")
        if inner is None:
            assert self._tokenizer is not None
            inner = self._tokenizer.encode(prompt["prompt"])
        token_ids = [int(t) for t in inner]
        text = prompt.get("prompt")
        prompt_embeds = mm_extra = mm_hash = None
        mm = prompt.get("multi_modal_data") or {}
        images = list(mm.get("image") or [])
        audios = mm.get("audio") or []
        videos = mm.get("video") or []
        if videos:
            # video -> uniform temporal sampling -> frame sequence
            # (reference inputs video path; EVS pruning utilities in
            # inputs/evs.py)
            from tensorrt_llm_tpu.inputs.evs import sample_video_frames
            nf = int(mm.get("num_frames", 8))
            for vid in videos:
                images.extend(sample_video_frames(vid, nf))
        if images or audios:
            # KV-reuse identity: two prompts with identical token ids but
            # different pixels must NOT share cached KV blocks — hash the
            # raw multimodal content into the reuse salt (reference
            # BlockKey mm hashes, kvCacheManager.h:148-195).
            import hashlib
            hh = hashlib.sha256()
            for a in (*images, *audios):
                arr = np.asarray(a)
                hh.update(str(arr.shape).encode())
                hh.update(arr.tobytes())
            mm_hash = hh.hexdigest()[:32]
            pix = []
            if images:
                if hasattr(self.model, "preprocess_images"):
                    # model-specific pipeline (Qwen2-VL native-
                    # resolution patches; also HF-processor outputs)
                    pix = self.model.preprocess_images(images)
                else:
                    from tensorrt_llm_tpu.inputs import preprocess_images
                    pix = preprocess_images(images, self.model.vision)
            if audios:
                out = self.model.process_multimodal(
                    self.engine.params, token_ids, pix, audios=audios)
            else:
                out = self.model.process_multimodal(
                    self.engine.params, token_ids, pix)
            if len(out) == 3:
                token_ids, prompt_embeds, mm_extra = out
            else:
                token_ids, prompt_embeds = out
        return token_ids, text, prompt_embeds, mm_extra, mm_hash

    def encode_multimodal(self, prompt: dict) -> dict:
        """EPD disagg encode stage (reference MultimodalEncoder,
        llmapi/mm_encoder.py): run ONLY the multimodal encoder (vision
        tower / audio conformer + projector and embedding fusion) and
        return a payload a generation server can consume via
        ``prompt["multi_modal_embeddings"]`` — no KV, no decode."""
        (token_ids, _text, prompt_embeds,
         mm_extra, mm_hash) = self._process_mm_prompt(prompt)
        if prompt_embeds is None:
            raise ValueError("prompt has no multimodal content to encode")
        return {
            "token_ids": [int(t) for t in token_ids],
            "embeds": np.asarray(prompt_embeds, np.float32),
            "extra": mm_extra,
            "mm_hash": mm_hash,
        }

    # ------------------------------------------------------------------ disagg ----
    def generate_context_only(self, prompt, sampling_params=None):
        """Disaggregated prefill side: run the context phase, return
        (first token ids, DisaggregatedParams for the decode server)."""
        from tensorrt_llm_tpu.llmapi.disagg_params import DisaggregatedParams
        fut = self.generate_async(
            prompt, sampling_params,
            disaggregated_params=DisaggregatedParams(
                request_type="context_only"))
        out = fut.result()
        first = out.outputs[0].token_ids
        return out, DisaggregatedParams(
            request_type="generation_only", first_gen_tokens=list(first),
            kv_payload=fut.req.kv_payload)

    def generate_context_only_streamed(self, prompt, sampling_params=None):
        """Streamed disaggregated prefill (reference ContextProgress
        layer-wise transfer, cacheTransceiver.cpp:203 — chunk-wise here):
        returns (GenerationFuture, frame queue).  KV frames appear on the
        queue WHILE later prefill chunks still compute; the stream ends
        with ``{"end": True, "first_gen_tokens": [...], ...}``.  Feed the
        frames to a decode server via ``DisaggregatedParams(kv_frames=q)``
        or ship them with ``frame_to_bytes``."""
        from tensorrt_llm_tpu.llmapi.disagg_params import DisaggregatedParams
        fut = self.generate_async(
            prompt, sampling_params,
            disaggregated_params=DisaggregatedParams(
                request_type="context_only", stream=True))
        return fut, fut.req.kv_stream

    # ------------------------------------------------------------------ scoring ---
    def score(self, token_ids) -> List[float]:
        """Teacher-forced log-probs: logprob of token_ids[i+1] given the
        prefix token_ids[:i+1] (used by the perplexity eval task)."""
        import jax.nn

        ids = list(token_ids)
        assert len(ids) >= 2, "need at least 2 tokens to score"
        engine, kv = self.engine, self.kv_manager
        req = LlmRequest(ids, SamplingParams(max_tokens=1))
        kv.add_sequence(req.request_id, ids)
        req.start_context()
        out = []
        try:
            pos = 0
            max_chunk = engine.prefill_buckets[-1]
            while pos < len(ids):
                chunk = min(len(ids) - pos, max_chunk)
                kv.grow_sequence(req.request_id, pos + chunk)
                inputs = engine.prepare_prefill_inputs(req, chunk)
                # all positions of this chunk, not just the last
                inputs.logit_indices = np.arange(len(inputs.input_ids),
                                                 dtype=np.int32)
                logits = engine.run_prefill(inputs)
                lp = jax.nn.log_softmax(
                    jnp.asarray(logits[:chunk], jnp.float32), axis=-1)
                # logits at row i predict token ids[pos+i+1]
                nxt = ids[pos + 1: pos + chunk + 1]
                rows = np.arange(len(nxt))
                out.extend(np.asarray(lp)[rows, nxt].tolist())
                req.context_position += chunk
                pos += chunk
        finally:
            kv.free_sequence(req.request_id)
        return out

    # ------------------------------------------------------------------ misc ------
    @property
    def tokenizer(self):
        return self._tokenizer

    @property
    def num_devices(self) -> int:
        """Chips this instance computes on (per-chip throughput divisor)."""
        mesh = getattr(self.engine, "mesh", None)
        return mesh.devices.size if mesh is not None else 1

    def get_stats(self) -> List[dict]:
        return self.executor.get_stats()

    # ------------------------------------------------------------------ encoder ---
    def embed(self, prompts, pooling: str = "cls"):
        """Encoder models: [B] texts/token-lists -> [B, H] embeddings
        (reference /v1/embeddings serving over BERT-class models)."""
        assert getattr(self, "encoder", None) is not None, \
            "embed() needs an encoder-class model (e.g. BertModel)"
        ids = self._encode_batch(prompts)
        return self.encoder.embed(ids, pooling=pooling)

    def score_pairs(self, prompts):
        """Encoder classification logits (reranker scores)."""
        assert getattr(self, "encoder", None) is not None
        return self.encoder.score(self._encode_batch(prompts))

    def _encode_batch(self, prompts):
        out = []
        for p in prompts:
            if isinstance(p, str):
                assert self._tokenizer is not None
                out.append(self._tokenizer.encode(p))
            else:
                out.append([int(t) for t in p])
        return out

    def get_kv_cache_stats(self) -> dict:
        return self.kv_manager.stats()

    def get_kv_cache_events(self, since_id: int = 0) -> list:
        """Stored-block event stream (reference kvCacheEventManager /
        /kv_cache_events route); feeds external KV-aware routers."""
        return self.kv_manager.get_events(since_id)

    def match_kv_prefix(self, token_ids) -> int:
        """Tokens of this prompt whose KV is cached here right now — the
        KV-aware router's per-server match score."""
        return self.kv_manager.match_prefix(list(token_ids))

    def shutdown(self):
        if self.executor is not None:
            self.executor.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass


class GenerationFuture:
    """Handle for one in-flight request (sync result + streaming iterator)."""

    def __init__(self, llm: LLM, req: LlmRequest, prompt_text: Optional[str],
                 streaming: bool):
        self.llm = llm
        self.req = req
        self.prompt_text = prompt_text
        self.streaming = streaming

    @property
    def request_id(self) -> int:
        return self.req.request_id

    def _decode(self, token_ids: List[int]) -> str:
        tok = self.llm.tokenizer
        sp = self.req.sampling_params
        if tok is None or not sp.detokenize:
            return ""
        text = tok.decode(token_ids,
                          skip_special_tokens=sp.skip_special_tokens)
        stop = self.req.stop_string
        if stop and not sp.include_stop_str_in_output and stop in text:
            text = text[:text.index(stop)]
        return text

    def result(self, timeout: Optional[float] = None) -> RequestOutput:
        toks: List[int] = []
        reason = None
        while True:
            piece = self.req.out_queue.get(timeout=timeout)
            if piece.error:
                raise RuntimeError(f"generation failed: {piece.error}")
            if piece.truncate_to is not None:
                del toks[piece.truncate_to:]  # async stop-scan overshoot
            toks.extend(piece.new_token_ids)
            if piece.finished:
                reason = piece.finish_reason
                break
        beams = getattr(self.req, "beam_outputs", None)
        if beams:
            # beam search: one CompletionOutput per returned beam
            outputs = [CompletionOutput(
                index=i, text=self._decode(b["token_ids"]),
                token_ids=b["token_ids"],
                finish_reason=reason.value if reason else None,
                logprobs=b.get("logprobs"),
                cumulative_logprob=b["cumulative_logprob"])
                for i, b in enumerate(beams)]
        else:
            import numpy as _np
            gl = (None if not self.req.generation_logits
                  else _np.stack(self.req.generation_logits))
            outputs = [CompletionOutput(
                index=0, text=self._decode(toks), token_ids=toks,
                finish_reason=reason.value if reason else None,
                logprobs=self.req.logprobs or None,
                generation_logits=gl)]
        metrics = None
        if getattr(self.llm.args, "return_perf_metrics", False):
            r = self.req
            metrics = {
                "arrival_time": r.arrival_time,
                "first_scheduled_time": r.first_sched_time,
                "first_token_time": r.first_token_time,
                "last_token_time": r.end_time,
                "queue_time_s": (r.first_sched_time - r.arrival_time
                                 if r.first_sched_time else None),
                "ttft_s": (r.first_token_time - r.arrival_time
                           if r.first_token_time else None),
                "e2e_s": (r.end_time - r.arrival_time
                          if r.end_time else None),
                "kv_cache_hit_tokens": r.num_cached_tokens,
                "num_output_tokens": r.num_output_tokens,
            }
        return RequestOutput(
            request_id=self.req.request_id,
            prompt=self.prompt_text,
            prompt_token_ids=self.req.prompt_token_ids,
            outputs=outputs,
            finished=True,
            prompt_logprobs=self.req.prompt_logprobs,
            context_logits=self.req.context_logits,
            metrics=metrics)

    def __iter__(self) -> Iterator[RequestOutput]:
        # incremental detokenization: O(window) per piece instead of
        # re-decoding the full token list every streamed chunk (the
        # reference detokenizes incrementally and can offload it —
        # tensorrt_llm/executor/postproc_worker.py:52)
        from tensorrt_llm_tpu.llmapi.detokenizer import IncrementalDetokenizer
        sp = self.req.sampling_params
        tok = self.llm.tokenizer
        # stateful test doubles whose decode() is not suffix-consistent
        # (real tokenizers are) can opt out back to full re-decode
        incremental = getattr(tok, "supports_incremental_decode", True)
        detok = (IncrementalDetokenizer(tok, sp.skip_special_tokens)
                 if tok is not None and sp.detokenize and incremental
                 else None)
        toks: List[int] = []
        while True:
            piece = self.req.out_queue.get()
            if piece.error:
                raise RuntimeError(f"generation failed: {piece.error}")
            if piece.truncate_to is not None:
                del toks[piece.truncate_to:]  # async stop-scan overshoot
                if detok is not None:
                    # overshoot text was already pushed into the detok
                    # state; rebuild from the truncated tokens so the final
                    # text matches token_ids even when the stop-trim below
                    # is skipped (include_stop_str_in_output=True)
                    detok = IncrementalDetokenizer(tok,
                                                   sp.skip_special_tokens)
                    detok.push(toks)
            toks.extend(piece.new_token_ids)
            text = "" if detok is not None else self._decode(toks)
            if detok is None:
                stop = self.req.stop_string
                if (stop and text
                        and not sp.include_stop_str_in_output):
                    idx = text.find(stop)
                    if idx >= 0:
                        text = text[:idx]
            if detok is not None:
                new_text = detok.push(piece.new_token_ids)
                if piece.finished:
                    new_text += detok.flush()
                text = detok.text
                stop = self.req.stop_string
                if stop and not sp.include_stop_str_in_output:
                    # bounded tail scan: a match can only involve this
                    # piece's text plus len(stop)-1 older chars
                    idx = detok.find_stop(stop, len(new_text))
                    if idx < 0 and piece.finished and \
                            piece.finish_reason is FinishReason.STOP_STRING:
                        # the executor matched on its own (raw) decode of
                        # the tail; if our skip-special rendering differs,
                        # fall back to a full scan so the stop string never
                        # leaks into the final output (ADVICE r3)
                        idx = text.find(stop)
                    if idx >= 0:
                        text = text[:idx]
            out = RequestOutput(
                request_id=self.req.request_id,
                prompt=self.prompt_text,
                prompt_token_ids=self.req.prompt_token_ids,
                outputs=[CompletionOutput(
                    index=0, text=text,
                    token_ids=list(toks),
                    finish_reason=(piece.finish_reason.value
                                   if piece.finish_reason else None))],
                finished=piece.finished)
            yield out
            if piece.finished:
                return

    def cancel(self):
        self.llm.executor.cancel(self.req.request_id)


class MultimodalEncoder(LLM):
    """Encode-only endpoint for EPD (encode/prefill/decode) disaggregation
    — reference ``llmapi/mm_encoder.py`` MultimodalEncoder: builds the
    model (vision tower / audio encoder + embedding fusion) but serves no
    generation.  Use :meth:`encode_multimodal`; feed the payload to a
    generation server as ``prompt["multi_modal_embeddings"]``."""

    def __init__(self, model: Any = None, tokenizer: Any = None, **kwargs):
        kwargs.setdefault("kv_num_blocks", 8)
        kwargs.setdefault("enable_warmup", False)
        super().__init__(model=model, tokenizer=tokenizer, **kwargs)

    def generate_async(self, *a, **k):
        raise RuntimeError(
            "MultimodalEncoder is encode-only; use encode_multimodal()")


class _FanoutFuture:
    """Aggregates the n sibling requests of a parallel-sampling call
    (SamplingParams.n > 1) into one RequestOutput with n outputs."""

    def __init__(self, subs):
        self.subs = subs

    def result(self, timeout: Optional[float] = None) -> RequestOutput:
        results = [s.result(timeout=timeout) for s in self.subs]
        outputs = []
        for j, r in enumerate(results):
            o = r.outputs[0]
            outputs.append(CompletionOutput(
                index=j, text=o.text, token_ids=o.token_ids,
                finish_reason=o.finish_reason, logprobs=o.logprobs,
                cumulative_logprob=o.cumulative_logprob))
        first = results[0]
        return RequestOutput(
            request_id=first.request_id, prompt=first.prompt,
            prompt_token_ids=first.prompt_token_ids,
            outputs=outputs, finished=True)

    def cancel(self):
        for s in self.subs:
            s.cancel()


def _has_weights(path: str) -> bool:
    import glob
    return bool(glob.glob(os.path.join(path, "*.safetensors")))


def _safetensors_reader(path: str):
    """Lazy reader over sharded safetensors (reference: checkpoint loaders,
    `_torch/models/checkpoints/hf/`)."""
    import glob
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    index = {}
    handles = []
    for f in files:
        h = safe_open(f, framework="np")
        handles.append(h)
        for name in h.keys():
            index[name] = h

    def get_tensor(name: str):
        h = index.get(name)
        if h is None:
            return None
        return h.get_tensor(name)

    return get_tensor
