"""Generic decoder-only transformer for causal LM.

TPU-native counterpart of the reference's `_torch/models/modeling_utils.py`
(`DecoderModelForCausalLM`, `register_auto_model` AutoModel registry,
modeling_auto.py): a config-driven pre-norm decoder covering the Llama family
(Llama/TinyLlama/Mistral/Qwen2/Qwen3 dense) with:

  * fused QKV + gate_up projections (column-parallel, W4A16-quantizable),
  * paged KV cache threaded functionally through the forward,
  * pure `forward(params, ...)` so the engine jits whole steps,
  * per-layer Python loop (scan-over-layers is a later compile-time optim).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.attention import Attention
from tensorrt_llm_tpu.layers.embedding import Embedding
from tensorrt_llm_tpu.layers.linear import Linear, make_linear_method
from tensorrt_llm_tpu.layers.mlp import GatedMLP
from tensorrt_llm_tpu.ops.norms import add_rms_norm, layer_norm, rms_norm
from tensorrt_llm_tpu.ops.rope import RopeConfig, make_rope_tables
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.parallel.ops import tp_all_gather
from tensorrt_llm_tpu.quantization import QuantConfig


def _norm(cfg, x, p, eps):
    """Norm dispatch: rmsnorm takes a bare weight, layernorm a
    {"weight","bias"} dict."""
    if cfg.norm_type == "layernorm":
        return layer_norm(x, p["weight"], p.get("bias"), eps)
    return rms_norm(x, p, eps)


def _add_norm(cfg, x, residual, p, eps):
    """Fused residual-add + norm; returns (normed, new_residual)."""
    if cfg.norm_type == "layernorm":
        if residual is not None:
            x = (x.astype(jnp.float32)
                 + residual.astype(jnp.float32)).astype(x.dtype)
        return layer_norm(x, p["weight"], p.get("bias"), eps), x
    return add_rms_norm(x, residual, p, eps)


@dataclass
class ModelConfig:
    architecture: str = "LlamaForCausalLM"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: Optional[int] = None
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    max_position: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    o_bias: bool = False                  # o_proj bias (GPT-OSS)
    has_sinks: bool = False               # attention-sink logits (GPT-OSS)
    layer_types: Optional[tuple] = None   # per-layer "sliding_attention"/"full_attention"
    qk_norm: bool = False
    activation: str = "silu"
    sliding_window: Optional[int] = None
    # norm flavor: "rmsnorm" (default) or "layernorm" (Starcoder2/Nemotron —
    # norm params become {"weight", "bias"} dicts); Nemotron's layernorm1p
    # folds its (1 + w) convention into the weights at load time
    norm_type: str = "rmsnorm"
    norm_bias: bool = False
    # non-gated MLP: up -> activation -> down (Starcoder2 c_fc/c_proj,
    # Nemotron relu^2)
    mlp_gated: bool = True
    mlp_bias: bool = False
    # post-block norms (Olmo2/Exaone4): x += norm(attn(x)); x += norm(mlp(x))
    # — no pre-norms at all
    post_block_norms: bool = False
    # Granite scalar multipliers
    residual_multiplier: Optional[float] = None   # x += mult * block(x)
    logits_scaling: Optional[float] = None        # logits /= scaling
    # Olmo2: q/k RMSNorm over the FLATTENED heads*head_dim vector
    qk_norm_flat: bool = False
    # Gemma-family extras
    post_norms: bool = False              # post-attn/post-ffw norms
    gemma_norm: bool = False              # RMSNorm uses (1 + w) convention
    embedding_multiplier: Optional[float] = None   # sqrt(hidden) for gemma
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    sliding_window_pattern: int = 1       # every Nth layer is global
    rope_local_theta: Optional[float] = None  # separate rope for local layers
    # Llama4 extras (HF Llama4TextConfig)
    no_rope_layer_interval: int = 0       # every Nth layer skips rope (0=off)
    attention_chunk_size: Optional[int] = None  # chunked attn on rope layers
    qk_norm_l2: bool = False              # unweighted post-rope q/k RMS
    qk_norm_post_rope: bool = False       # HunYuan: weighted post-rope q/k RMS
    # Qwen3-VL DeepStack: visual features from N vision-tower taps are added
    # to the hidden stream after decoder layers 0..N-1 (arXiv:2406.04334);
    # they ride input_embeds as N extra feature blocks of width hidden_size
    deepstack_layers: int = 0
    attn_temperature_tuning: bool = False  # NoPE-layer q temperature scaling
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    gqa_rope_interleave: bool = False     # adjacent-pair rotary (Llama4)
    # MoE (0 experts => dense MLP everywhere)
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = True
    moe_score_func: str = "softmax"
    n_shared_experts: int = 0
    decoder_sparse_step: int = 1
    mlp_only_layers: tuple = ()
    # GPT-OSS MoE: biased router, topk-then-softmax, per-expert biases
    moe_router_bias: bool = False
    moe_topk_then_softmax: bool = False
    moe_expert_bias: bool = False
    # DeepSeek-style noaux-tc routing (sigmoid + correction bias + group topk)
    moe_has_score_bias: bool = False
    # Llama4: topk on raw logits then sigmoid weights (no renorm), router
    # weight applied to the expert INPUT (HF Llama4TextMoe)
    moe_topk_then_sigmoid: bool = False
    moe_apply_router_weight_on_input: bool = False
    # EP dispatch row capacity factor (None = exact dropless dispatch)
    moe_capacity_factor: Optional[float] = None
    # Wide-EP hot-expert replication: extra weight slots for replicas
    moe_redundant_experts: int = 0
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    # SSM / Mamba2 (state-space) layers
    ssm_state_size: int = 128
    ssm_conv_kernel: int = 4
    ssm_n_groups: int = 1
    ssm_num_heads: Optional[int] = None
    ssm_head_dim: int = 64
    ssm_expand: int = 2
    ssm_chunk_size: int = 64
    # MLA (DeepSeek V2/V3) — kv_lora_rank set => MLA attention
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_interleave: bool = True
    dtype: Any = jnp.bfloat16
    quant: Optional[QuantConfig] = None
    mapping: Mapping = field(default_factory=Mapping)
    # sparse long-context decode (reference sparse attention backends,
    # _torch/attention_backend/sparse/): {"topk_blocks", "sink_blocks",
    # "recent_blocks"}; None = dense
    sparse_attention: Optional[dict] = None
    # "auto" (pallas on TPU, xla elsewhere) | "pallas" | "xla" — explicit
    # selection mirrors the reference attn_backend arg
    attention_backend: str = "auto"
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_heads
        if self.moe_intermediate_size is None:
            self.moe_intermediate_size = self.intermediate_size

    def is_moe_layer(self, idx: int) -> bool:
        return (self.num_experts > 0 and idx not in self.mlp_only_layers
                and (idx + 1) % self.decoder_sparse_step == 0)

    def is_nope_layer(self, idx: int) -> bool:
        """Llama4: every Nth layer skips rope and attends globally.  An
        explicit HF `no_rope_layers` list (1 = rope) wins when present."""
        lst = self.extra.get("no_rope_layers")
        if lst:
            return int(lst[idx]) == 0
        return (self.no_rope_layer_interval > 0
                and (idx + 1) % self.no_rope_layer_interval == 0)

    def is_sliding_layer(self, idx: int) -> bool:
        """Gemma-style pattern: every sliding_window_pattern-th layer is
        global; all others use the sliding window (pattern 1 => all sliding
        when a window is set, Mistral-style).  An explicit per-layer
        layer_types list (GPT-OSS/Gemma3 HF convention) wins.  Llama4's
        chunked-attention layers count as sliding for KV-pool purposes
        (lookback bounded by the chunk size)."""
        if self.layer_types is not None:
            return self.layer_types[idx] in ("sliding_attention",
                                             "chunked_attention")
        if self.attention_chunk_size:
            return not self.is_nope_layer(idx)
        if self.sliding_window is None:
            return False
        if self.sliding_window_pattern <= 1:
            return True
        return (idx + 1) % self.sliding_window_pattern != 0

    @property
    def rope_local(self) -> Optional[RopeConfig]:
        if self.rope_local_theta is None:
            return None
        return dataclasses.replace(self.rope, theta=self.rope_local_theta,
                                   scaling_type=None)

    # ---- MLA helpers ----------------------------------------------------------
    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank is not None

    @property
    def kv_pool_heads(self) -> int:
        """KV-head count of the paged pools (1 latent "head" under MLA)."""
        return 1 if self.is_mla else self.num_kv_heads

    @property
    def kv_pool_dim(self) -> int:
        if self.is_mla:
            # latent width rounded up to the TPU lane tile (128): Mosaic's
            # HBM tiling pads the trailing dim anyway, and logically-aligned
            # rows are what lets the Pallas MLA kernel DMA whole pages
            dk = self.kv_lora_rank + self.qk_rope_head_dim
            return -(-dk // 128) * 128
        return self.head_dim

    @property
    def mla_scale(self) -> float:
        """Softmax scale for MLA: qk_head_dim^-0.5 x yarn mscale^2 (the HF
        DeepseekV3Attention convention)."""
        import math
        scale = (self.qk_nope_head_dim + self.qk_rope_head_dim) ** -0.5
        scaling = self.rope_scaling or {}
        msc_all = scaling.get("mscale_all_dim", 0)
        if msc_all:
            f = scaling.get("factor", 1.0)
            m = 0.1 * msc_all * math.log(f) + 1.0 if f > 1 else 1.0
            scale *= m * m
        return scale

    @property
    def rope(self) -> RopeConfig:
        scaling = self.rope_scaling or {}
        stype = scaling.get("rope_type") or scaling.get("type")
        mrope = tuple(scaling["mrope_section"]) \
            if scaling.get("mrope_section") else None
        if stype in ("mrope", "default"):
            stype = None   # mrope changes position SELECTION, not freqs
        return RopeConfig(
            mrope_sections=mrope,
            mrope_interleaved=bool(scaling.get("mrope_interleaved")),
            head_dim=self.qk_rope_head_dim if self.is_mla else self.head_dim,
            theta=self.rope_theta,
            max_position=self.max_position,
            scaling_type=stype,
            scaling_factor=scaling.get("factor", 1.0),
            low_freq_factor=scaling.get("low_freq_factor", 1.0),
            high_freq_factor=scaling.get("high_freq_factor", 4.0),
            original_max_position=scaling.get(
                "original_max_position_embeddings", self.max_position),
            truncate=bool(scaling.get("truncate", True)),
            beta_fast=scaling.get("beta_fast") or 32.0,
            beta_slow=scaling.get("beta_slow") or 1.0,
            mscale=scaling.get("mscale"),
            mscale_all_dim=scaling.get("mscale_all_dim"),
            attention_factor=scaling.get("attention_factor"),
            interleaved=(self.rope_interleave and self.is_mla)
            or self.gqa_rope_interleave,
            # partial rotary (GLM/Nemotron): rotate only the leading
            # head_dim * factor dims, pass the tail through
            rotary_dim=(int(self.head_dim
                            * self.extra["partial_rotary_factor"])
                        if not self.is_mla
                        and self.extra.get("partial_rotary_factor")
                        else None),
        )

    @classmethod
    def from_hf_config(cls, hf, quant: Optional[QuantConfig] = None,
                       mapping: Optional[Mapping] = None,
                       dtype=jnp.bfloat16) -> "ModelConfig":
        """Build from a transformers PretrainedConfig (or plain dict)."""
        get = (lambda k, d=None: getattr(hf, k, d)) if not isinstance(hf, dict) \
            else (lambda k, d=None: hf.get(k, d))
        # Nemotron-Nano-VL composite: llm_config + RADIO vision_config
        # (reference modeling_nemotron_nano.py)
        if get("llm_config") is not None and get("vision_config") is not None:
            cfg = cls.from_hf_config(get("llm_config"), quant=quant,
                                     mapping=mapping, dtype=dtype)
            archs = get("architectures")
            cfg.architecture = archs[0] if archs else "NemotronH_Nano_VL_V2"
            vc = get("vision_config")
            cfg.extra["vision_config"] = (vc if isinstance(vc, dict)
                                          else vc.to_dict())
            for k in ("force_image_size", "patch_size", "downsample_ratio",
                      "projector_hidden_size", "vit_hidden_size",
                      "image_token_id", "image_token_index", "ps_version"):
                if get(k) is not None:
                    cfg.extra[k] = get(k)
            return cfg
        # VILA composite configs: llm_cfg / vision_tower_cfg /
        # mm_projector_cfg sub-model dicts (reference modeling_vila.py)
        if get("llm_cfg") is not None:
            cfg = cls.from_hf_config(get("llm_cfg"), quant=quant,
                                     mapping=mapping, dtype=dtype)
            archs = get("architectures")
            cfg.architecture = archs[0] if archs else "LlavaLlamaModel"
            for k in ("vision_tower_cfg", "mm_projector_cfg",
                      "mm_hidden_size", "image_token_index"):
                if get(k) is not None:
                    v = get(k)
                    cfg.extra[k] = (v if isinstance(v, (dict, int))
                                    else v.to_dict())
            return cfg
        # HyperCLOVA-X VLM composite: language_config + SigLIP
        # vision_config + C-Abstractor knobs (reference
        # modeling_hyperclovax.py:1031-1060)
        if get("language_config") is not None \
                and get("vision_config") is not None:
            cfg = cls.from_hf_config(get("language_config"), quant=quant,
                                     mapping=mapping, dtype=dtype)
            archs = get("architectures")
            cfg.architecture = archs[0] if archs else "HCXVisionForCausalLM"
            vc = get("vision_config")
            cfg.extra["vision_config"] = (vc if isinstance(vc, dict)
                                          else vc.to_dict())
            for k in ("num_queries_vis_abstractor", "proj_pos_emb",
                      "proj_prenorm", "unpad", "use_nth_layer", "anyres",
                      "max_num_grids", "use_1x1_grid", "image_token_index",
                      "img_start_id"):
                if get(k) is not None:
                    cfg.extra[k] = get(k)
            return cfg
        # VLM composite configs (LLaVA-class): build from text_config, stash
        # the vision tower config + image token in extra
        if get("vision_config") is not None and get("text_config") is not None:
            cfg = cls.from_hf_config(get("text_config"), quant=quant,
                                     mapping=mapping, dtype=dtype)
            archs = get("architectures")
            cfg.architecture = (archs[0] if archs
                                else "LlavaForConditionalGeneration")
            vc = get("vision_config")
            vc = vc if isinstance(vc, dict) else vc.to_dict()
            cfg.extra["vision_config"] = vc
            if (vc.get("model_type") == "pixtral"
                    and cfg.architecture == "LlavaForConditionalGeneration"):
                # Pixtral ships under the Llava arch name with a pixtral
                # vision tower — route to the dedicated class
                cfg.architecture = "PixtralForConditionalGeneration"
            for k in ("image_token_index", "image_token_id",
                      "video_token_id", "vision_start_token_id",
                      "mm_tokens_per_image", "vision_feature_layer",
                      "vision_feature_select_strategy",
                      "image_grid_pinpoints", "spatial_merge_size",
                      "image_break_token_id", "image_end_token_id",
                      "projector_hidden_act"):
                if get(k) is not None:
                    cfg.extra[k] = get(k)
            return cfg
        archs = get("architectures")
        if archs:
            arch = archs[0]
        elif get("model_type"):
            # derive "deepseek_v3" -> "DeepseekV3ForCausalLM" etc.
            mt = get("model_type")
            arch = "".join(w.capitalize() for w in mt.split("_")) + "ForCausalLM"
        else:
            arch = "LlamaForCausalLM"
        num_experts = (get("num_local_experts") or get("num_experts")
                       or get("n_routed_experts") or 0)
        # DeepSeek: first_k_dense_replace leading dense layers
        mlp_only = tuple(get("mlp_only_layers") or ())
        if get("first_k_dense_replace"):
            mlp_only = tuple(range(get("first_k_dense_replace")))
        is_deepseek = get("kv_lora_rank") is not None
        is_gpt_oss = arch == "GptOssForCausalLM"
        cfg = cls(
            num_experts=num_experts,
            num_experts_per_tok=get("num_experts_per_tok", 2),
            moe_intermediate_size=get("moe_intermediate_size"),
            norm_topk_prob=bool(get("norm_topk_prob", True)),
            decoder_sparse_step=get("decoder_sparse_step", 1),
            mlp_only_layers=mlp_only,
            moe_score_func="sigmoid" if is_deepseek else "softmax",
            moe_has_score_bias=is_deepseek,
            activation="swiglu_oai" if is_gpt_oss else "silu",
            moe_router_bias=is_gpt_oss,
            moe_topk_then_softmax=is_gpt_oss,
            moe_expert_bias=is_gpt_oss,
            has_sinks=is_gpt_oss,
            o_bias=is_gpt_oss and bool(get("attention_bias", False)),
            layer_types=tuple(get("layer_types")) if get("layer_types") else None,
            n_shared_experts=get("n_shared_experts") or 0,
            n_group=get("n_group") or 1,
            topk_group=get("topk_group") or 1,
            routed_scaling_factor=get("routed_scaling_factor") or 1.0,
            # plain Mamba2 configs use bare names; Bamba-style hybrids
            # prefix them with mamba_*
            ssm_state_size=get("state_size") or get("mamba_d_state") or 128,
            ssm_conv_kernel=get("conv_kernel") or get("mamba_d_conv") or 4,
            ssm_n_groups=get("n_groups") or get("mamba_n_groups") or 1,
            ssm_num_heads=(get("num_heads")
                           if get("state_size") is not None
                           else get("mamba_n_heads")),
            ssm_head_dim=(get("head_dim") or 64
                          if get("state_size") is not None
                          else get("mamba_d_head") or 64),
            ssm_expand=get("expand") or get("mamba_expand") or 2,
            ssm_chunk_size=(get("chunk_size") or get("mamba_chunk_size")
                            or 64),
            q_lora_rank=get("q_lora_rank"),
            kv_lora_rank=get("kv_lora_rank"),
            # DeepSeek V3.2 DSA: index_topk in the HF config enables the
            # lightning-indexer sparse path (reference SparseAttentionConfig
            # llm_args.py:286, sparse/dsa.py)
            sparse_attention=({"algo": "dsa",
                               "index_n_heads": get("index_n_heads", 64),
                               "index_head_dim": get("index_head_dim", 128),
                               "index_topk": get("index_topk")}
                              if get("index_topk")
                              and get("kv_lora_rank") is not None else None),
            qk_nope_head_dim=get("qk_nope_head_dim") or 128,
            qk_rope_head_dim=get("qk_rope_head_dim") or 64,
            v_head_dim=get("v_head_dim") or 128,
            rope_interleave=bool(get("rope_interleave", True)),
            architecture=arch,
            vocab_size=get("vocab_size", 32000),
            hidden_size=get("hidden_size", 4096),
            intermediate_size=get("intermediate_size", 11008),
            num_layers=get("num_hidden_layers", 32),
            num_heads=get("num_attention_heads", 32),
            num_kv_heads=get("num_key_value_heads") or get("num_attention_heads", 32),
            head_dim=get("head_dim"),
            rms_eps=(get("rms_norm_eps") or get("layer_norm_epsilon")
                     or get("norm_epsilon") or get("norm_eps") or 1e-5),
            rope_theta=get("rope_theta", 10000.0),
            rope_scaling=get("rope_scaling"),
            max_position=get("max_position_embeddings", 4096),
            tie_word_embeddings=get("tie_word_embeddings", False),
            attention_bias=bool(get("attention_bias", False)
                                or get("qkv_bias", False)),
            sliding_window=get("sliding_window"),
            dtype=dtype,
            quant=quant,
            mapping=mapping or Mapping(),
            extra={k: get(k) for k in (
                "query_pre_attn_scalar", "attn_logit_softcapping",
                "final_logit_softcapping", "sliding_window_pattern",
                "hidden_activation", "rope_local_base_freq", "layer_types",
                "norm_topk_prob", "shared_expert_intermediate_size",
                "partial_rotary_factor", "hidden_act", "use_bias",
                "mlp_bias", "embedding_multiplier", "residual_multiplier",
                "attention_multiplier", "logits_scaling",
                "attn_layer_indices", "hybrid_override_pattern",
                "shared_intermediate_size", "position_embedding_type",
                "block_size", "linear_num_value_heads",
                "linear_num_key_heads", "linear_key_head_dim",
                "linear_value_head_dim", "linear_conv_kernel_dim",
                "linear_attn_alpha_factor",
                "linear_attn_beta_factor", "full_attn_alpha_factor",
                "full_attn_beta_factor", "mlp_alpha_factor",
                "mlp_beta_factor", "layer_norm_eps", "type_vocab_size",
                "num_labels",
                # LFM2 short-conv hybrid + HunYuan MoE
                "cross_attention_layers", "num_shared_experts",
                "block_configs",
                "conv_L_cache", "conv_bias", "block_auto_adjust_ff_dim",
                "block_ffn_dim_multiplier", "block_multiple_of", "moe_topk",
                # Llama4 (HF Llama4TextConfig)
                "no_rope_layers", "no_rope_layer_interval",
                "attention_chunk_size", "use_qk_norm",
                "attn_temperature_tuning", "floor_scale", "attn_scale",
                "interleave_moe_layer_step", "intermediate_size_mlp",
                "moe_layers",
            ) if get(k) is not None},
        )
        for sub in ("vision_config", "audio_config"):
            v = get(sub)
            if v is not None:
                # flat multimodal configs (Phi-4-MM: text fields top-level
                # with vision/audio sub-configs) — stash the tower configs
                cfg.extra[sub] = v if isinstance(v, dict) else v.to_dict()
        return cfg


class DecoderLayer:
    """Pre-norm decoder block: x + attn(norm(x)); x + mlp(norm(x))."""

    def __init__(self, cfg: ModelConfig, layer_idx: int):
        self.cfg = cfg
        self.layer_idx = layer_idx
        self.sliding = cfg.is_sliding_layer(layer_idx)
        self.is_moe = cfg.is_moe_layer(layer_idx)
        tp = cfg.mapping.tp_size
        if cfg.is_mla:
            from tensorrt_llm_tpu.layers.mla import MLA
            self.attn = MLA(
                hidden_size=cfg.hidden_size,
                num_heads=cfg.num_heads,
                q_lora_rank=cfg.q_lora_rank,
                kv_lora_rank=cfg.kv_lora_rank,
                qk_nope_head_dim=cfg.qk_nope_head_dim,
                qk_rope_head_dim=cfg.qk_rope_head_dim,
                v_head_dim=cfg.v_head_dim,
                rope=cfg.rope,
                scale=cfg.mla_scale,
                rms_eps=cfg.rms_eps,
                dtype=cfg.dtype,
                quant=cfg.quant,
                tp_size=tp,
                sparse=(cfg.sparse_attention
                        if (cfg.sparse_attention or {}).get("algo") == "dsa"
                        else None),
            )
        else:
            self.attn = self._make_gqa(cfg, tp)
        if cfg.is_moe_layer(layer_idx):
            from tensorrt_llm_tpu.layers.moe import MoE
            self.mlp = MoE(
                hidden_size=cfg.hidden_size,
                intermediate_size=cfg.moe_intermediate_size,
                num_experts=cfg.num_experts,
                top_k=cfg.num_experts_per_tok,
                activation=cfg.activation,
                score_func=cfg.moe_score_func,
                renormalize=cfg.norm_topk_prob,
                n_shared_experts=cfg.n_shared_experts,
                has_score_bias=cfg.moe_has_score_bias,
                has_router_bias=cfg.moe_router_bias,
                topk_then_softmax=cfg.moe_topk_then_softmax,
                topk_then_sigmoid=cfg.moe_topk_then_sigmoid,
                apply_weight_on_input=cfg.moe_apply_router_weight_on_input,
                has_expert_bias=cfg.moe_expert_bias,
                n_group=cfg.n_group,
                topk_group=cfg.topk_group,
                routed_scaling=cfg.routed_scaling_factor,
                capacity_factor=cfg.moe_capacity_factor,
                redundant_experts=cfg.moe_redundant_experts,
                dtype=cfg.dtype,
                quant=cfg.quant,
                ep_size=cfg.mapping.moe_ep_size,
                tp_size=cfg.mapping.moe_tp_size,
                count_psum_axes=tuple(
                    a for a, s in (("dp", cfg.mapping.dp_size),
                                   ("cp", cfg.mapping.cp_size))
                    if s > 1),
            )
        elif not cfg.mlp_gated:
            from tensorrt_llm_tpu.layers.mlp import MLP
            self.mlp = MLP(
                hidden_size=cfg.hidden_size,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.activation,
                has_bias=cfg.mlp_bias,
                dtype=cfg.dtype,
                quant=cfg.quant,
                tp_size=tp,
            )
        else:
            self.mlp = GatedMLP(
                hidden_size=cfg.hidden_size,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.activation,
                dtype=cfg.dtype,
                quant=cfg.quant,
                tp_size=tp,
            )

    def _make_gqa(self, cfg: ModelConfig, tp: int) -> Attention:
        nope = cfg.is_nope_layer(self.layer_idx)
        chunk = (cfg.attention_chunk_size
                 if cfg.attention_chunk_size and self.sliding else None)
        backend_cls = None
        if cfg.sparse_attention is not None and not self.sliding \
                and cfg.sparse_attention.get("algo") != "dsa":
            from tensorrt_llm_tpu.attention_backend.sparse_backend import (
                make_sparse_backend)
            backend_cls = make_sparse_backend(cfg.sparse_attention)
        elif getattr(cfg, "attention_backend", "auto") not in (
                "auto", "sparse"):
            from tensorrt_llm_tpu.attention_backend import (
                get_attention_backend)
            backend_cls = get_attention_backend(cfg.attention_backend)
        return Attention(
            backend_cls=backend_cls,
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_heads,
            num_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            rope=cfg.rope,
            has_bias=cfg.attention_bias,
            has_o_bias=cfg.o_bias,
            has_sinks=cfg.has_sinks,
            has_qk_norm=cfg.qk_norm,
            qk_norm_flat=cfg.qk_norm_flat,
            qk_norm_l2=cfg.qk_norm_l2 and not nope,
            qk_norm_post_rope=cfg.qk_norm_post_rope,
            nope=nope,
            attn_temperature_tuning=(cfg.attn_temperature_tuning and nope),
            floor_scale=cfg.floor_scale,
            attn_scale=cfg.attn_scale,
            attention_chunk=chunk,
            rms_eps=cfg.rms_eps,
            scale=(cfg.query_pre_attn_scalar ** -0.5
                   if cfg.query_pre_attn_scalar else None),
            sliding_window=(cfg.sliding_window
                            if self.sliding and chunk is None else None),
            logit_cap=cfg.attn_logit_softcap,
            dtype=cfg.dtype,
            quant=cfg.quant,
            tp_size=tp,
            cp_size=cfg.mapping.cp_size,
            cp_type=cfg.mapping.cp_type,
        )

    def _norm_init(self):
        w = jnp.ones((self.cfg.hidden_size,), jnp.float32)
        if self.cfg.norm_type == "layernorm":
            return {"weight": w, "bias": jnp.zeros_like(w)}
        return w

    def _norm_spec(self):
        if self.cfg.norm_type == "layernorm":
            return {"weight": P(None), "bias": P(None)}
        return P(None)

    def init(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        p = {
            "attn": self.attn.init(k1),
            "mlp": self.mlp.init(k2),
        }
        if self.cfg.post_block_norms:
            p["post_attn_norm"] = self._norm_init()
            p["post_ffw_norm"] = self._norm_init()
            return p
        p["input_norm"] = self._norm_init()
        p["post_attn_norm"] = self._norm_init()
        if self.cfg.post_norms:
            p["pre_ffw_norm"] = self._norm_init()
            p["post_ffw_norm"] = self._norm_init()
        return p

    def param_specs(self) -> Dict:
        p = {
            "post_attn_norm": self._norm_spec(),
            "attn": self.attn.param_specs(),
            "mlp": self.mlp.param_specs(),
        }
        if self.cfg.post_block_norms:
            p["post_ffw_norm"] = self._norm_spec()
            return p
        p["input_norm"] = self._norm_spec()
        if self.cfg.post_norms:
            p["pre_ffw_norm"] = self._norm_spec()
            p["post_ffw_norm"] = self._norm_spec()
        return p

    def __call__(self, params, x, residual, rope_tables, kv_cache, meta):
        """rope_tables: ((cos, sin) global, optional (cos, sin) local).

        MoE layers carry (attn_kv_cache, expert_load_counts) as their cache
        so Wide-EP load statistics accumulate on device with zero syncs."""
        global_t, local_t = rope_tables
        tables = local_t if (self.sliding and local_t is not None) else global_t
        if self.sliding:
            # VSWA: attend this layer against its cyclic-ring pool when the
            # engine allocated separate window pools (reference per-window
            # WindowBlockManager, kvCacheManager.h:600)
            meta = meta.for_sliding_layer()
        eps = self.cfg.rms_eps
        moe_counts = None
        if self.is_moe and isinstance(kv_cache, tuple) and len(kv_cache) == 2 \
                and getattr(kv_cache[1], "ndim", None) == 1:
            kv_cache, moe_counts = kv_cache

        cfg = self.cfg
        if cfg.post_block_norms:
            # Olmo2/Exaone4: blocks read the RAW stream, norms apply to the
            # block OUTPUTS: x += norm(attn(x)); x += norm(mlp(x))
            if residual is not None:
                x = (x.astype(jnp.float32)
                     + residual.astype(jnp.float32)).astype(x.dtype)
            a, kv_cache = self.attn(params["attn"], x, tables, kv_cache, meta)
            a = _norm(cfg, a, params["post_attn_norm"], eps)
            x = (x.astype(jnp.float32)
                 + a.astype(jnp.float32)).astype(x.dtype)
            if moe_counts is not None:
                m, moe_counts = self.mlp(params["mlp"], x,
                                         lora_ids=meta.lora_ids,
                                         counts=moe_counts)
                kv_cache = (kv_cache, moe_counts)
            else:
                m = self.mlp(params["mlp"], x, lora_ids=meta.lora_ids)
            out = _norm(cfg, m, params["post_ffw_norm"], eps)
            return out, x, kv_cache
        if cfg.post_norms:
            # Gemma2/3 and GLM-4 sandwich norms:
            # x += post_norm(attn(pre_norm(x))); same for ffw
            h, residual = _add_norm(cfg, x, residual, params["input_norm"], eps)
            h, kv_cache = self.attn(params["attn"], h, tables, kv_cache, meta)
            h = _norm(cfg, h, params["post_attn_norm"], eps)
            h2, residual = _add_norm(cfg, h, residual, params["pre_ffw_norm"],
                                     eps)
            out = self.mlp(params["mlp"], h2, lora_ids=meta.lora_ids)
            out = _norm(cfg, out, params["post_ffw_norm"], eps)
            return out, residual, kv_cache
        rm = cfg.residual_multiplier   # Granite: x += rm * block(x)
        h, residual = _add_norm(cfg, x, residual, params["input_norm"], eps)
        h, kv_cache = self.attn(params["attn"], h, tables, kv_cache, meta)
        if rm is not None:
            h = (h.astype(jnp.float32) * rm).astype(h.dtype)
        h2, residual = _add_norm(cfg, h, residual, params["post_attn_norm"],
                                 eps)
        if moe_counts is not None:
            out, moe_counts = self.mlp(params["mlp"], h2,
                                       lora_ids=meta.lora_ids,
                                       counts=moe_counts)
            if rm is not None:
                out = (out.astype(jnp.float32) * rm).astype(out.dtype)
            return out, residual, (kv_cache, moe_counts)
        out = self.mlp(params["mlp"], h2, lora_ids=meta.lora_ids)
        if rm is not None:
            out = (out.astype(jnp.float32) * rm).astype(out.dtype)
        return out, residual, kv_cache


_MODEL_REGISTRY: Dict[str, type] = {}


def register_auto_model(*architectures):
    def deco(cls):
        for a in architectures:
            _MODEL_REGISTRY[a] = cls
        return cls
    return deco


def get_model_class(architecture: str) -> type:
    if architecture not in _MODEL_REGISTRY:
        raise KeyError(
            f"architecture {architecture!r} not registered; known: "
            f"{sorted(_MODEL_REGISTRY)}")
    return _MODEL_REGISTRY[architecture]


class DecoderModelForCausalLM:
    """Llama-family causal LM. Subclasses tweak config defaults + weight maps."""

    # HF weight-name templates for MoE layers (Qwen-MoE style defaults;
    # Mixtral overrides in models/mixtral.py) — the analog of the reference's
    # per-model weight mappers (_torch/models/checkpoints/hf/*_weight_mapper.py)
    MOE_ROUTER_KEY = "mlp.gate.weight"
    MOE_EXPERT_KEY = "mlp.experts.{j}.{proj}.weight"
    MOE_PROJ_NAMES = {"gate": "gate_proj", "up": "up_proj", "down": "down_proj"}
    MOE_SHARED_PREFIX = "mlp.shared_experts."
    # per-layer norm HF names (Glm4 overrides for its sandwich norms)
    NORM_KEYS = {"input_norm": "input_layernorm",
                 "post_attn_norm": "post_attention_layernorm",
                 "pre_ffw_norm": "pre_feedforward_layernorm",
                 "post_ffw_norm": "post_feedforward_layernorm"}
    # non-gated MLP HF names (Starcoder2 overrides to c_fc/c_proj)
    MLP_UP_KEY = "mlp.up_proj"
    MLP_DOWN_KEY = "mlp.down_proj"
    # layernorm1p (Nemotron): fold the (1 + w) convention into the weights
    NORM_WEIGHT_OFFSET = 0.0
    # per-head q/k norm HF names (HunYuan overrides)
    Q_NORM_KEY = "self_attn.q_norm.weight"
    K_NORM_KEY = "self_attn.k_norm.weight"
    MOE_BIAS_KEY = "mlp.gate.e_score_correction_bias"

    def make_layer_caches(self, kv_manager):
        """Paged KV pools; MoE layers additionally carry an on-device
        expert-load counter (Wide-EP load-balancer statistic)."""
        pools = kv_manager.allocate_pools()
        out = []
        # counters are per physical SLOT (num_experts + redundant replicas)
        E = self.cfg.num_experts + self.cfg.moe_redundant_experts
        for i, pool in enumerate(pools):
            if self.cfg.is_moe_layer(i):
                out.append((pool, jnp.zeros((E,), jnp.int32)))
            else:
                out.append(pool)
        return out

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        tp = cfg.mapping.tp_size
        self.embedding = Embedding(cfg.vocab_size, cfg.hidden_size, cfg.dtype,
                                   tp_size=tp)
        self.layers = [DecoderLayer(cfg, i) for i in range(cfg.num_layers)]
        # LM head stays unquantized by default (reference excludes it too).
        lm_tp = "column" if (tp > 1 and cfg.vocab_size % tp == 0) else "none"
        self.lm_head = Linear(cfg.hidden_size, cfg.vocab_size, False, cfg.dtype,
                              make_linear_method(cfg.quant, "lm_head"),
                              tp_mode=lm_tp, tp_size=tp if lm_tp != "none" else 1)
        self._rope_tables = None

    # ---- parameters -----------------------------------------------------------
    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.cfg.num_layers + 2)
        params = {
            "embedding": self.embedding.init(keys[0]),
            "layers": [l.init(keys[i + 1]) for i, l in enumerate(self.layers)],
            "final_norm": self.layers[0]._norm_init(),
            "rope": tuple(make_rope_tables(self.cfg.rope)),
        }
        if self.cfg.rope_local is not None:
            params["rope_local"] = tuple(make_rope_tables(self.cfg.rope_local))
        if not self.cfg.tie_word_embeddings:
            params["lm_head"] = self.lm_head.init(keys[-1])
        return params

    def param_specs(self) -> Dict:
        specs = {
            "embedding": self.embedding.param_specs(),
            "layers": [l.param_specs() for l in self.layers],
            "final_norm": self.layers[0]._norm_spec(),
            "rope": (P(None, None), P(None, None)),
            "rope_local": (P(None, None), P(None, None)),
        }
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = self.lm_head.param_specs()
        return specs

    # ---- forward ----------------------------------------------------------------
    def forward(
        self,
        params: Dict,
        input_ids: jax.Array,                       # [T] int32
        kv_caches: List[Tuple[jax.Array, jax.Array]],
        meta: AttentionMetadata,
        logit_indices: Optional[jax.Array] = None,  # [B] rows to project
        return_hidden: bool = False,
        capture: str = "final",
        input_embeds: Optional[jax.Array] = None,   # [T, H] overrides ids
    ) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
        """return_hidden: additionally return hidden states at logit_indices
        rows — the tap one-model speculative drafters feed on (reference
        _torch/speculative/mtp.py, eagle3.py).  capture="final" returns the
        final-norm stream [*, H]; capture="eagle3" concatenates the residual
        stream after a low/mid/high layer [*, 3H] (EAGLE-3's multi-level
        feature fusion).
        """
        cfg = self.cfg
        deepstack = None
        if input_embeds is not None:
            # multimodal: pre-fused embeddings (text + projected image
            # features spliced at placeholder rows — reference
            # inputs/registry.py prompt embedding path)
            # fused multimodal embeddings arrive PRE-scaled (Gemma3-VL
            # scales text rows only; image features replace post-scale)
            if cfg.deepstack_layers:
                H = cfg.hidden_size
                deepstack = input_embeds[:, H:].astype(cfg.dtype)
                input_embeds = input_embeds[:, :H]
            x = input_embeds.astype(cfg.dtype)
        else:
            x = self.embedding(params["embedding"], input_ids)
            if cfg.embedding_multiplier:
                x = (x.astype(jnp.float32)
                     * cfg.embedding_multiplier).astype(x.dtype)
        residual = None
        rope_tables = (params["rope"], params.get("rope_local"))
        new_caches = []
        L = len(self.layers)
        cap_at = {0, L // 2, L - 1} if capture == "eagle3" else set()
        captured = []
        for i, layer in enumerate(self.layers):
            x, residual, cache = layer(
                params["layers"][i], x, residual, rope_tables, kv_caches[i],
                meta)
            new_caches.append(cache)
            if deepstack is not None and i < cfg.deepstack_layers:
                # DeepStack: inject tap i into the full stream (x+residual);
                # text rows carry zeros in these feature blocks
                H = cfg.hidden_size
                x = x + deepstack[:, i * H:(i + 1) * H]
            if return_hidden and i in cap_at:
                h = x if residual is None else (
                    x.astype(jnp.float32) + residual.astype(jnp.float32)
                ).astype(x.dtype)
                captured.append(h)
        # the "final" hidden tap is the PRE-final-norm residual stream:
        # DeepSeek MTP's hnorm (and EAGLE training data) are trained on the
        # raw stream, not the final_norm-weighted one (reference
        # modeling_deepseekv3.py:1382 captures before next_layer_layernorm)
        pre_final = None
        if return_hidden and capture != "eagle3":
            pre_final = x if residual is None else (
                x.astype(jnp.float32) + residual.astype(jnp.float32)
            ).astype(x.dtype)
        x, _ = _add_norm(cfg, x, residual, params["final_norm"], cfg.rms_eps)
        if cfg.mapping.cp_size > 1 and meta.mode == "prefill" \
                and cfg.mapping.cp_type != "star":
            # Ulysses/ring: the residual stream is sequence-sharded over
            # "cp"; regather the full sequence before logit extraction.
            # Star keeps rank-local [anchor; chunk] rows — logit_indices are
            # rank-local and the engine picks the owner rank's row.
            x = jax.lax.all_gather(x, "cp", axis=0, tiled=True)
            if pre_final is not None:
                pre_final = jax.lax.all_gather(pre_final, "cp", axis=0,
                                               tiled=True)
        if logit_indices is not None:
            x = x[logit_indices]
            if pre_final is not None:
                pre_final = pre_final[logit_indices]
        hidden = None
        if return_hidden:
            if capture == "eagle3":
                # pad duplicate capture points (tiny models) so the fused
                # width is always 3H
                while len(captured) < 3:
                    captured.append(captured[-1])
                hidden = jnp.concatenate(captured[:3], axis=-1)
                if logit_indices is not None:
                    hidden = hidden[logit_indices]
            else:
                hidden = pre_final
        if cfg.tie_word_embeddings:
            logits = jnp.dot(x, params["embedding"]["weight"].T.astype(x.dtype),
                             preferred_element_type=jnp.float32)
        else:
            logits = self.lm_head(params["lm_head"], x).astype(jnp.float32)
        if self.lm_head.tp_mode == "column" and cfg.mapping.tp_size > 1 \
                and not cfg.tie_word_embeddings:
            logits = tp_all_gather(logits, axis=-1)
        if cfg.logits_scaling:
            logits = logits / cfg.logits_scaling   # Granite
        if cfg.final_logit_softcap:
            c = cfg.final_logit_softcap
            logits = c * jnp.tanh(logits / c)
        if return_hidden:
            return logits, hidden, new_caches
        return logits, new_caches

    # ---- pipeline-parallel stage decomposition -----------------------------------
    # The layer loop is cut into contiguous stages; the residual stream is
    # materialized (x + residual) at stage boundaries so each stage restarts
    # with residual=None — numerically identical to the fused loop.
    def forward_first_stage(self, params, input_ids, kv_caches, meta,
                            layer_hi: int):
        cfg = self.cfg
        x = self.embedding(params["embedding"], input_ids)
        if cfg.embedding_multiplier:
            x = (x.astype(jnp.float32) * cfg.embedding_multiplier).astype(x.dtype)
        return self._run_layers(params, x, None, kv_caches, meta, 0, layer_hi)

    def forward_mid_stage(self, params, h, kv_caches, meta,
                          layer_lo: int, layer_hi: int):
        return self._run_layers(params, h, None, kv_caches, meta,
                                layer_lo, layer_hi)

    def forward_last_stage(self, params, h, kv_caches, meta, layer_lo: int,
                           logit_indices):
        cfg = self.cfg
        h, new_caches = self._run_layers(params, h, None, kv_caches, meta,
                                         layer_lo, cfg.num_layers,
                                         materialize=False)
        x, residual = h
        x, _ = _add_norm(cfg, x, residual, params["final_norm"], cfg.rms_eps)
        if logit_indices is not None:
            x = x[logit_indices]
        if cfg.tie_word_embeddings:
            logits = jnp.dot(x, params["embedding"]["weight"].T.astype(x.dtype),
                             preferred_element_type=jnp.float32)
        else:
            logits = self.lm_head(params["lm_head"], x).astype(jnp.float32)
        if self.lm_head.tp_mode == "column" and cfg.mapping.tp_size > 1 \
                and not cfg.tie_word_embeddings:
            logits = tp_all_gather(logits, axis=-1)
        if cfg.logits_scaling:
            logits = logits / cfg.logits_scaling   # Granite
        if cfg.final_logit_softcap:
            c = cfg.final_logit_softcap
            logits = c * jnp.tanh(logits / c)
        return logits, new_caches

    def _run_layers(self, params, x, residual, kv_caches, meta,
                    lo: int, hi: int, materialize: bool = True):
        """Run layers [lo, hi); kv_caches/params['layers'] are indexed
        RELATIVE to lo (a stage holds only its own slice)."""
        rope_tables = (params["rope"], params.get("rope_local"))
        new_caches = []
        for i in range(lo, hi):
            x, residual, cache = self.layers[i](
                params["layers"][i - lo], x, residual, rope_tables,
                kv_caches[i - lo], meta)
            new_caches.append(cache)
        if not materialize:
            return (x, residual), new_caches
        out = x if residual is None else (
            x.astype(jnp.float32) + residual.astype(jnp.float32)
        ).astype(x.dtype)
        return out, new_caches

    # ---- HF weight loading ------------------------------------------------------
    def load_hf_weights(self, get_tensor, dtype=None, placer=None) -> Dict:
        """Build params from an HF checkpoint.

        get_tensor(name) -> np/jnp array for HF parameter `name` (our analog of
        the reference's per-model weight mappers, _torch/models/checkpoints/).

        placer(path, subtree) -> subtree, when given, is called with each
        completed per-layer dict (path ``("layers", i)``) and each top-level
        entry so the caller can quantize-commit it to its final (mesh-
        sharded) device placement immediately and free the host staging —
        the reference streams checkpoints shard-by-shard per rank the same
        way (_torch/pyexecutor/model_loader.py:182).  Tensors stage as host
        numpy f32, so peak host memory is ~one layer, not the whole model.
        """
        import numpy as np
        cfg = self.cfg

        quant = cfg.quant
        pre_q = bool(quant is not None
                     and getattr(quant, "pre_quantized", False))

        def t(name):  # HF linear weights are [out, in] -> ours [in, out]
            if pre_q:
                # AWQ/GPTQ checkpoint: quantized linears ship
                # qweight/qzeros/scales instead of .weight — ingest exactly
                # (QTensor is already [in, out]; floats still transpose)
                from tensorrt_llm_tpu.quantization.hf_ingest import (
                    maybe_load_quantized)
                qt = maybe_load_quantized(get_tensor, name,
                                          quant.ckpt_format,
                                          v2=quant.ckpt_v2)
                if qt is not None:
                    return qt
            return np.asarray(get_tensor(name)).astype(np.float32).T

        def vec(name):
            arr = get_tensor(name)
            return None if arr is None else np.asarray(arr).astype(np.float32)

        def nvec(base):
            """Load one norm's params honoring cfg.norm_type / norm_bias
            (layernorm1p models fold their +1 via NORM_WEIGHT_OFFSET)."""
            w = vec(base + ".weight")
            if w is not None and self.NORM_WEIGHT_OFFSET:
                w = w + self.NORM_WEIGHT_OFFSET
            if cfg.norm_type != "layernorm":
                return w
            b = vec(base + ".bias") if cfg.norm_bias else None
            return {"weight": w,
                    "bias": b if b is not None else jnp.zeros_like(w)}

        place = placer if placer is not None else (lambda path, sub: sub)
        params = {
            "embedding": place(("embedding",), self.embedding.from_float(
                np.asarray(get_tensor("model.embed_tokens.weight")))),
            "final_norm": place(("final_norm",), nvec("model.norm")),
            "rope": tuple(make_rope_tables(cfg.rope)),
            "layers": [],
        }
        if cfg.rope_local is not None:
            params["rope_local"] = tuple(make_rope_tables(cfg.rope_local))
        for i, layer in enumerate(self.layers):
            pre = f"model.layers.{i}."
            if not hasattr(layer, "attn") or getattr(
                    layer, "skip_base_load", False):
                # non-standard block (Mllama cross-attention layer, DeciLM
                # NAS block): the subclass loader fills this slot itself
                params["layers"].append(None)
                continue
            if cfg.post_block_norms:
                norms = {
                    "post_attn_norm": nvec(
                        pre + self.NORM_KEYS["post_attn_norm"]),
                    "post_ffw_norm": nvec(
                        pre + self.NORM_KEYS["post_ffw_norm"]),
                }
            else:
                norms = {
                    "input_norm": nvec(pre + self.NORM_KEYS["input_norm"]),
                    "post_attn_norm": nvec(
                        pre + self.NORM_KEYS["post_attn_norm"]),
                    **({"pre_ffw_norm": nvec(
                            pre + self.NORM_KEYS["pre_ffw_norm"]),
                        "post_ffw_norm": nvec(
                            pre + self.NORM_KEYS["post_ffw_norm"])}
                       if cfg.post_norms else {}),
                }
            lp = {
                **norms,
                "attn": self._load_attn(layer, pre, t, vec),
                "mlp": self._load_mlp(layer, get_tensor, pre, t),
            }
            params["layers"].append(place(("layers", i), lp))
        if not cfg.tie_word_embeddings:
            params["lm_head"] = place(
                ("lm_head",),
                self.lm_head.quantize_from_float(t("lm_head.weight")))
        return params

    def _load_attn(self, layer, pre: str, t, vec):
        """Load one layer's attention params from HF names (GQA default;
        DeepSeek overrides for MLA)."""
        cfg = self.cfg
        has_b = cfg.attention_bias
        return layer.attn.from_float(
            t(pre + "self_attn.q_proj.weight"),
            t(pre + "self_attn.k_proj.weight"),
            t(pre + "self_attn.v_proj.weight"),
            t(pre + "self_attn.o_proj.weight"),
            q_b=vec(pre + "self_attn.q_proj.bias") if has_b else None,
            k_b=vec(pre + "self_attn.k_proj.bias") if has_b else None,
            v_b=vec(pre + "self_attn.v_proj.bias") if has_b else None,
            o_b=vec(pre + "self_attn.o_proj.bias") if cfg.o_bias else None,
            q_norm=vec(pre + self.Q_NORM_KEY) if cfg.qk_norm else None,
            k_norm=vec(pre + self.K_NORM_KEY) if cfg.qk_norm else None,
            sinks=vec(pre + "self_attn.sinks") if cfg.has_sinks else None,
        )

    def _load_mlp(self, layer, get_tensor, pre: str, t):
        """Load one layer's MLP params (dense or MoE) from HF names."""
        import numpy as np
        from tensorrt_llm_tpu.layers.mlp import MLP
        from tensorrt_llm_tpu.layers.moe import MoE

        def vec(name):
            arr = get_tensor(name)
            return None if arr is None else np.asarray(arr).astype(
                np.float32)

        if isinstance(layer.mlp, MLP):   # non-gated (Starcoder2/Nemotron)
            cfg = self.cfg
            act = None
            if layer.mlp.activation == "xielu":
                # Apertus learned xIELU params live under mlp.act_fn.*
                act = {"alpha_p": vec(pre + "mlp.act_fn.alpha_p"),
                       "alpha_n": vec(pre + "mlp.act_fn.alpha_n")}
            return layer.mlp.from_float(
                t(pre + self.MLP_UP_KEY + ".weight"),
                t(pre + self.MLP_DOWN_KEY + ".weight"),
                up_b=vec(pre + self.MLP_UP_KEY + ".bias")
                if cfg.mlp_bias else None,
                down_b=vec(pre + self.MLP_DOWN_KEY + ".bias")
                if cfg.mlp_bias else None,
                act=act)
        if not isinstance(layer.mlp, MoE):
            return layer.mlp.from_float(
                t(pre + "mlp.gate_proj.weight"),
                t(pre + "mlp.up_proj.weight"),
                t(pre + "mlp.down_proj.weight"))
        cfg = self.cfg
        router = t(pre + self.MOE_ROUTER_KEY)  # [H, E] after transpose
        stacks = {}
        for kind in ("gate", "up", "down"):
            proj = self.MOE_PROJ_NAMES[kind]
            mats = []
            for j in range(cfg.num_experts):
                name = pre + self.MOE_EXPERT_KEY.format(j=j, proj=proj)
                mats.append(np.asarray(get_tensor(name))
                            .astype(np.float32).T)
            stacks[kind] = np.stack(mats)  # [E, in, out]
        shared = None
        if layer.mlp.n_shared_experts:
            sp = pre + self.MOE_SHARED_PREFIX
            shared = layer.mlp.shared.from_float(
                t(sp + "gate_proj.weight"), t(sp + "up_proj.weight"),
                t(sp + "down_proj.weight"))
        bias = None
        if layer.mlp.has_score_bias:
            arr = get_tensor(pre + self.MOE_BIAS_KEY)
            if arr is not None:
                bias = np.asarray(arr).astype(np.float32)
        return layer.mlp.from_float(router, stacks["gate"], stacks["up"],
                                    stacks["down"], shared=shared,
                                    score_bias=bias)
