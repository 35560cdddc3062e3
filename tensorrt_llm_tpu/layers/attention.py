"""Multi-head attention module (GQA) over a paged KV cache.

Counterpart of the reference's `_torch/modules/attention.py:556`: fused QKV
column-parallel projection, RoPE, optional per-head Q/K RMSNorm (Qwen3/Gemma3),
backend attention call, row-parallel output projection with all-reduce.

TP semantics: query and KV heads are sharded over the "tp" mesh axis (the KV
cache itself is head-sharded — each rank holds its heads' pages).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.linear import Linear, make_linear_method
from tensorrt_llm_tpu.ops.norms import rms_norm
from tensorrt_llm_tpu.ops.rope import RopeConfig, apply_rope, make_rope_tables
from tensorrt_llm_tpu.quantization import QuantConfig


@dataclass
class Attention:
    hidden_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope: RopeConfig
    has_bias: bool = False        # qkv bias (Qwen2 style)
    has_o_bias: bool = False      # o_proj bias (GPT-OSS)
    has_sinks: bool = False       # per-head attention-sink logits (GPT-OSS)
    has_qk_norm: bool = False     # per-head q/k RMSNorm (Qwen3)
    qk_norm_flat: bool = False    # Olmo2: RMSNorm over flattened heads*D
    qk_norm_l2: bool = False      # Llama4: unweighted q/k RMS AFTER rope
    qk_norm_post_rope: bool = False  # HunYuan: WEIGHTED q/k RMS AFTER rope
    nope: bool = False            # Llama4 NoPE layer: skip rope entirely
    attn_temperature_tuning: bool = False  # Llama4 NoPE q scaling
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    attention_chunk: Optional[int] = None  # Llama4 chunked attention
    rms_eps: float = 1e-6
    scale: Optional[float] = None
    sliding_window: Optional[int] = None
    logit_cap: Optional[float] = None
    dtype: jnp.dtype = jnp.bfloat16
    quant: Optional[QuantConfig] = None
    tp_size: int = 1
    cp_size: int = 1              # context parallel (seq-sharded prefill)
    cp_type: str = "ulysses"      # "ulysses" | "ring"
    backend_cls: type = None

    def __post_init__(self):
        assert self.num_heads % self.tp_size == 0
        assert self.num_kv_heads % self.tp_size == 0, (
            "kv-head replication for tp > num_kv_heads not yet implemented")
        self.scale = self.scale or self.head_dim ** -0.5
        self.n_local_heads = self.num_heads // self.tp_size
        self.n_local_kv = self.num_kv_heads // self.tp_size
        if self.cp_size > 1 and self.cp_type == "ulysses":
            assert self.n_local_heads % self.cp_size == 0, (
                "Ulysses CP needs query heads divisible by cp x tp")
            assert self.n_local_kv % self.cp_size == 0, (
                "Ulysses CP needs kv heads divisible by cp x tp")
        method = lambda name: make_linear_method(self.quant, name)
        qkv_out = (self.num_heads + 2 * self.num_kv_heads) * self.head_dim
        self.qkv = Linear(self.hidden_size, qkv_out, self.has_bias, self.dtype,
                          method("qkv_proj"), tp_mode="column",
                          tp_size=self.tp_size)
        self.o = Linear(self.num_heads * self.head_dim, self.hidden_size,
                        self.has_o_bias, self.dtype, method("o_proj"),
                        tp_mode="row", tp_size=self.tp_size)
        if self.backend_cls is None:
            from tensorrt_llm_tpu.attention_backend import get_attention_backend
            self.backend_cls = get_attention_backend("auto")
        self.backend = self.backend_cls(
            self.n_local_heads, self.n_local_kv, self.head_dim, self.scale,
            self.sliding_window, self.logit_cap,
            attention_chunk=self.attention_chunk)

    # ---- params ---------------------------------------------------------------
    def init(self, key) -> Dict:
        keys = jax.random.split(key, 4)
        D, H = self.head_dim, self.hidden_size
        std = 0.5 / (H ** 0.5)
        q_w = jax.random.normal(keys[0], (H, self.num_heads * D), jnp.float32) * std
        k_w = jax.random.normal(keys[1], (H, self.num_kv_heads * D), jnp.float32) * std
        v_w = jax.random.normal(keys[2], (H, self.num_kv_heads * D), jnp.float32) * std
        o_w = jax.random.normal(keys[3], (self.num_heads * D, H), jnp.float32) * std
        zeros = (jnp.zeros((self.num_heads * D,), jnp.float32),
                 jnp.zeros((self.num_kv_heads * D,), jnp.float32),
                 jnp.zeros((self.num_kv_heads * D,), jnp.float32)) \
            if self.has_bias else (None, None, None)
        return self.from_float(
            q_w, k_w, v_w, o_w, q_b=zeros[0], k_b=zeros[1], v_b=zeros[2],
            o_b=jnp.zeros((self.hidden_size,), jnp.float32) if self.has_o_bias else None,
            q_norm=jnp.ones((self.n_local_heads * D if self.qk_norm_flat
                             else self.head_dim,), jnp.float32)
            if self.has_qk_norm else None,
            k_norm=jnp.ones((self.n_local_kv * D if self.qk_norm_flat
                             else self.head_dim,), jnp.float32)
            if self.has_qk_norm else None,
            sinks=(jax.random.normal(keys[0], (self.num_heads,), jnp.float32)
                   * 0.5 if self.has_sinks else None))

    def from_float(self, q_w, k_w, v_w, o_w, q_b=None, k_b=None, v_b=None,
                   o_b=None, q_norm=None, k_norm=None, sinks=None) -> Dict:
        """Fuse full [in, out] float Q/K/V weights, interleaved per TP shard."""
        tp = self.tp_size
        D = self.head_dim
        qh, kvh = self.n_local_heads, self.n_local_kv
        cols, bcols = [], []
        for r in range(tp):
            cols.append(q_w[:, r * qh * D:(r + 1) * qh * D])
            cols.append(k_w[:, r * kvh * D:(r + 1) * kvh * D])
            cols.append(v_w[:, r * kvh * D:(r + 1) * kvh * D])
            if q_b is not None:
                bcols.append(q_b[r * qh * D:(r + 1) * qh * D])
                bcols.append(k_b[r * kvh * D:(r + 1) * kvh * D])
                bcols.append(v_b[r * kvh * D:(r + 1) * kvh * D])
        from tensorrt_llm_tpu.quantization.hf_ingest import wcat
        fused_w = wcat(cols, axis=1)
        fused_b = jnp.concatenate(bcols) if bcols else None
        p = {"qkv": self.qkv.quantize_from_float(fused_w, fused_b),
             "o": self.o.quantize_from_float(o_w, o_b)}
        if self.has_sinks:
            # sinks shard with the query heads: interleave per tp rank
            qh = self.n_local_heads
            p["sinks"] = jnp.concatenate(
                [sinks[r * qh:(r + 1) * qh] for r in range(self.tp_size)]
            ).astype(jnp.float32)
        if self.has_qk_norm:
            p["q_norm"] = q_norm.astype(jnp.float32)
            p["k_norm"] = k_norm.astype(jnp.float32)
        return p

    def param_specs(self) -> Dict:
        from tensorrt_llm_tpu.parallel.ops import TP_AXES
        p = {"qkv": self.qkv.param_specs(), "o": self.o.param_specs(),
             # runtime multi-LoRA stacks (pruned when absent): B of the
             # column-parallel qkv shards on out, A of the row-parallel o
             # shards on in
             "lora": {"qkv": (P(None, None, None), P(None, None, TP_AXES)),
                      "o": (P(None, TP_AXES, None), P(None, None, None))}}
        if self.has_sinks:
            # sinks pair 1:1 with query heads, which shard over the full
            # ("ep","tp") attention-TP product — P("tp") alone would leave
            # sinks misaligned with their heads whenever moe_ep > 1
            p["sinks"] = P(TP_AXES)
        if self.has_qk_norm:
            p["q_norm"] = P(None)
            p["k_norm"] = P(None)
        return p

    # ---- forward ----------------------------------------------------------------
    def __call__(
        self,
        params: Dict,
        x: jax.Array,                 # [T, hidden]
        rope_tables: Tuple[jax.Array, jax.Array],
        kv_cache: Tuple[jax.Array, jax.Array],
        meta: AttentionMetadata,
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        T = x.shape[0]
        D = self.head_dim
        qh, kvh = self.n_local_heads, self.n_local_kv

        qkv = self.qkv(params["qkv"], x)  # [T, (qh+2kvh)*D] local
        lora = params.get("lora")
        if lora and "qkv" in lora and meta.lora_ids is not None:
            from tensorrt_llm_tpu.lora.multi_lora import apply_lora
            qkv = apply_lora(x, qkv, lora["qkv"], meta.lora_ids)
        q = qkv[:, : qh * D].reshape(T, qh, D)
        k = qkv[:, qh * D:(qh + kvh) * D].reshape(T, kvh, D)
        v = qkv[:, (qh + kvh) * D:].reshape(T, kvh, D)

        if self.has_qk_norm and self.qk_norm_flat:
            # Olmo2: one RMS over the whole flattened projection output
            assert self.tp_size == 1, \
                "flat qk-norm needs a cross-shard mean; TP lands later"
            q = rms_norm(q.reshape(T, qh * D), params["q_norm"],
                         self.rms_eps).reshape(T, qh, D)
            k = rms_norm(k.reshape(T, kvh * D), params["k_norm"],
                         self.rms_eps).reshape(T, kvh, D)
        elif self.has_qk_norm and not self.qk_norm_post_rope:
            q = rms_norm(q, params["q_norm"], self.rms_eps)
            k = rms_norm(k, params["k_norm"], self.rms_eps)

        cos_t, sin_t = rope_tables
        sinks = params.get("sinks")

        if self.cp_size > 1:
            return self._forward_cp(params, q, k, v, kv_cache, meta,
                                    cos_t, sin_t, sinks)

        q, k = self._position_transform(q, k, meta.positions, cos_t, sin_t,
                                        mrope=meta.mrope_positions,
                                        post_norms=self._post_norms(params))
        if isinstance(kv_cache, (tuple, list)) and len(kv_cache) == 3:
            # sparse backend: third leaf is the per-page KT summary pool
            k_cache, v_cache, kt_cache = kv_cache
            out, k_cache, v_cache, kt_cache = self.backend(
                q, k, v, k_cache, v_cache, meta, sinks=sinks,
                kt_cache=kt_cache)
            new_cache = (k_cache, v_cache, kt_cache)
        else:
            k_cache, v_cache = kv_cache
            out, k_cache, v_cache = self.backend(q, k, v, k_cache, v_cache,
                                                 meta, sinks=sinks)
            new_cache = (k_cache, v_cache)
        out = out.reshape(T, qh * D)
        y = self.o(params["o"], out)
        if lora and "o" in lora and meta.lora_ids is not None:
            from tensorrt_llm_tpu.lora.multi_lora import apply_lora
            y = apply_lora(out, y, lora["o"], meta.lora_ids,
                           row_parallel=self.tp_size > 1)
        return y, new_cache

    def _post_norms(self, params):
        """HunYuan-style weighted per-head q/k RMSNorm AFTER rope."""
        if self.has_qk_norm and self.qk_norm_post_rope:
            return params["q_norm"], params["k_norm"]
        return None

    def _position_transform(self, q, k, positions, cos_t, sin_t,
                            mrope=None, post_norms=None):
        """RoPE (unless NoPE) + post-rope extras: Llama4 unweighted q/k RMS
        (Llama4TextL2Norm), HunYuan weighted q/k RMSNorm, and NoPE-layer
        temperature tuning
        (q *= log1p(floor((pos+1)/floor_scale)) * attn_scale + 1)."""
        if not self.nope:
            if mrope is not None and self.rope.mrope_sections:
                from tensorrt_llm_tpu.ops.rope import apply_mrope
                q, k = apply_mrope(q, k, mrope, cos_t, sin_t,
                                   self.rope.mrope_sections,
                                   interleaved=self.rope.mrope_interleaved)
            else:
                q, k = apply_rope(q, k, positions, cos_t, sin_t,
                                  interleaved=self.rope.interleaved)
        if self.qk_norm_l2:
            ones = jnp.ones((self.head_dim,), jnp.float32)
            q = rms_norm(q, ones, 1e-6)
            k = rms_norm(k, ones, 1e-6)
        if post_norms is not None:
            q = rms_norm(q, post_norms[0], self.rms_eps)
            k = rms_norm(k, post_norms[1], self.rms_eps)
        if self.attn_temperature_tuning:
            pos = positions.astype(jnp.float32)
            scale = (jnp.log1p(jnp.floor((pos + 1.0) / self.floor_scale))
                     * self.attn_scale + 1.0)
            q = (q.astype(jnp.float32) * scale[:, None, None]).astype(q.dtype)
        return q, k

    def _forward_cp(self, params, q, k, v, kv_cache, meta, cos_t, sin_t,
                    sinks):
        """Ulysses context parallelism (reference CpType.ULYSSES,
        mapping.py:67; head-scatter/seq-gather alltoall around attention):

        prefill — activations arrive SEQUENCE-sharded over "cp"; an
        all_to_all regroups q/k/v to all-tokens x (heads/cp), attention runs
        on the full sequence with a head subset, and a reverse all_to_all
        restores sequence sharding before the tp-row-parallel o_proj.

        decode — one token per sequence (nothing to shard in seq): each cp
        rank processes its 1/cp slice of the local heads and an all_gather
        over "cp" reassembles heads before o_proj.  KV pools are
        head-sharded over ("cp","ep","tp") so both paths write disjoint
        head slices for all tokens.
        """
        import jax.lax as lax

        D = self.head_dim
        cp = self.cp_size
        qh, kvh = self.n_local_heads, self.n_local_kv
        assert not (isinstance(kv_cache, (tuple, list))
                    and len(kv_cache) == 3), \
            "sparse attention backend is not supported under context " \
            "parallelism"
        k_cache, v_cache = kv_cache

        if self.cp_type == "helix":
            # Helix decode-CP (reference docs/source/features/helix.md,
            # kernels/helixKernels.cu): this sequence's KV pages are
            # block-cyclic over "cp"; every rank writes its own positions
            # (engine-prepared rank-local slots), attends its shard, and the
            # flash softmax stats psum-combine over ICI.
            from tensorrt_llm_tpu.ops.attention_xla import (
                helix_combine, helix_partial_decode_xla,
                helix_partial_prefill_xla, write_kv_cache)
            q, k = self._position_transform(
                q, k, meta.positions, cos_t, sin_t,
                mrope=meta.mrope_positions,
                post_norms=self._post_norms(params))
            k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                              meta.slot_mapping)
            r = lax.axis_index("cp")
            if meta.mode == "prefill":
                o, l, m = helix_partial_prefill_xla(
                    q, k_cache, v_cache, meta.block_tables[0],
                    meta.kv_lens[0], meta.positions, r, cp, self.scale,
                    self.sliding_window, self.logit_cap,
                    self.attention_chunk)
            else:
                o, l, m = helix_partial_decode_xla(
                    q, k_cache, v_cache, meta.block_tables, meta.kv_lens,
                    r, cp, self.scale, self.sliding_window, self.logit_cap,
                    self.attention_chunk)
            out = helix_combine(o, l, m, "cp", sinks=sinks).astype(q.dtype)
            rows = out.shape[0]
            return (self.o(params["o"], out.reshape(rows, qh * D)),
                    (k_cache, v_cache))

        if self.cp_type == "star":
            # Star attention (reference CpType.STAR / star_flashinfer.py):
            # prefill = per-rank LOCAL causal attention over [anchor;
            # chunk_r] rows (zero communication — the scaling win); decode =
            # per-rank partial attention over the contiguous KV chunks,
            # psum-combined like helix.
            assert self.sliding_window is None \
                and self.attention_chunk is None, \
                "sliding-window under star CP lands later"
            from tensorrt_llm_tpu.ops.attention_xla import (
                helix_combine, star_local_prefill_xla,
                star_partial_decode_xla, write_kv_cache)
            q, k = self._position_transform(
                q, k, meta.positions, cos_t, sin_t,
                mrope=meta.mrope_positions,
                post_norms=self._post_norms(params))
            k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                              meta.slot_mapping)
            if meta.mode == "prefill":
                out = star_local_prefill_xla(
                    q, k, v, meta.positions, meta.kv_lens[0], self.scale,
                    self.logit_cap, sinks=sinks)
            else:
                o, l, m = star_partial_decode_xla(
                    q, k_cache, v_cache, meta.block_tables, meta.kv_lens,
                    self.scale, self.logit_cap)
                out = helix_combine(o, l, m, "cp",
                                    sinks=sinks).astype(q.dtype)
            rows = out.shape[0]
            return (self.o(params["o"], out.reshape(rows, qh * D)),
                    (k_cache, v_cache))

        if self.cp_type == "ring":
            if meta.mode != "prefill":
                # ring shards only the quadratic prefill; decode runs the
                # replicated single-rank path (pools replicate over cp)
                q, k = self._position_transform(
                    q, k, meta.positions, cos_t, sin_t,
                    mrope=meta.mrope_positions,
                    post_norms=self._post_norms(params))
                out, k_cache, v_cache = self.backend(
                    q, k, v, k_cache, v_cache, meta, sinks=sinks)
                B = out.shape[0]
                return (self.o(params["o"], out.reshape(B, qh * D)),
                        (k_cache, v_cache))
            from tensorrt_llm_tpu.ops.attention_xla import write_kv_cache
            from tensorrt_llm_tpu.ops.ring_attention import ring_attention
            Tl = q.shape[0]
            idx = lax.axis_index("cp")
            pos_local = lax.dynamic_slice_in_dim(
                meta.positions, idx * Tl, Tl)
            q, k = self._position_transform(
                q, k, pos_local, cos_t, sin_t,
                post_norms=self._post_norms(params))
            # cache writes are all-gathered so the cp-replicated pools stay
            # identical on every rank (decode reads them locally)
            k_full = lax.all_gather(k, "cp", axis=0, tiled=True)
            v_full = lax.all_gather(v, "cp", axis=0, tiled=True)
            k_cache, v_cache = write_kv_cache(
                k_cache, v_cache, k_full, v_full, meta.slot_mapping)
            # mask padded K rows (positions past the real chunk length) by
            # pushing them after every query position
            chunk_len = meta.kv_lens[0] - meta.q_offset
            gidx = idx * Tl + jnp.arange(Tl)
            pos_k = jnp.where(gidx < chunk_len, pos_local, jnp.int32(2**30))
            out = ring_attention(q, k, v, pos_local, pos_k, self.scale)
            return (self.o(params["o"], out.reshape(Tl, qh * D)),
                    (k_cache, v_cache))

        if meta.mode == "prefill":
            # [T/cp, h, D] -> [T, h/cp, D]: gather seq, scatter heads
            q = lax.all_to_all(q, "cp", split_axis=1, concat_axis=0, tiled=True)
            k = lax.all_to_all(k, "cp", split_axis=1, concat_axis=0, tiled=True)
            v = lax.all_to_all(v, "cp", split_axis=1, concat_axis=0, tiled=True)
            if sinks is not None:
                idx = lax.axis_index("cp")
                sinks = lax.dynamic_slice_in_dim(
                    sinks, idx * (qh // cp), qh // cp)
            q, k = self._position_transform(
                q, k, meta.positions, cos_t, sin_t,
                mrope=meta.mrope_positions,
                post_norms=self._post_norms(params))
            out, k_cache, v_cache = self.backend(
                q, k, v, k_cache, v_cache, meta, sinks=sinks)
            # [T, h/cp, D] -> [T/cp, h, D]
            out = lax.all_to_all(out, "cp", split_axis=0, concat_axis=1,
                                 tiled=True)
            Tl = out.shape[0]
            return (self.o(params["o"], out.reshape(Tl, qh * D)),
                    (k_cache, v_cache))

        # decode: slice this rank's head subset
        idx = lax.axis_index("cp")
        q = lax.dynamic_slice_in_dim(q, idx * (qh // cp), qh // cp, axis=1)
        k = lax.dynamic_slice_in_dim(k, idx * (kvh // cp), kvh // cp, axis=1)
        v = lax.dynamic_slice_in_dim(v, idx * (kvh // cp), kvh // cp, axis=1)
        if sinks is not None:
            sinks = lax.dynamic_slice_in_dim(sinks, idx * (qh // cp), qh // cp)
        q, k = self._position_transform(
            q, k, meta.positions, cos_t, sin_t,
            mrope=meta.mrope_positions,
            post_norms=self._post_norms(params))
        out, k_cache, v_cache = self.backend(
            q, k, v, k_cache, v_cache, meta, sinks=sinks)
        out = lax.all_gather(out, "cp", axis=1, tiled=True)  # heads back
        B = out.shape[0]
        return (self.o(params["o"], out.reshape(B, qh * D)),
                (k_cache, v_cache))
