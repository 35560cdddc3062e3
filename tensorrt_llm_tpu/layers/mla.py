"""Multi-head Latent Attention module (DeepSeek V2/V3).

Counterpart of the reference's `MLA` module (`_torch/modules/attention.py:1217`)
and its weight-absorption path: Q is (optionally) low-rank projected, KV is
compressed to ``kv_lora_rank`` latent channels plus a head-shared rope key,
and the per-head up-projections from `kv_b_proj` are *absorbed* into the query
and output sides so the paged cache stores only latents (ops/mla.py).

TP semantics: query heads (q_b / absorbed W_uk / W_uv, o_proj) shard over the
"tp" mesh axis; the latent path (q_a, kv_a, norms) and the latent cache are
replicated — MLA's latent is MQA-like, shared by all heads, so there is no
head axis to shard and its cache is small (L+R channels/token).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.linear import Linear, make_linear_method
from tensorrt_llm_tpu.ops.mla import (
    mla_decode_xla,
    mla_prefill_xla,
    write_latent_cache,
)
from tensorrt_llm_tpu.ops.norms import rms_norm
from tensorrt_llm_tpu.ops.rope import RopeConfig, apply_rope
from tensorrt_llm_tpu.quantization import QuantConfig


@dataclass
class MLA:
    hidden_size: int
    num_heads: int
    q_lora_rank: Optional[int]      # None => direct q_proj (V2-Lite)
    kv_lora_rank: int
    qk_nope_head_dim: int
    qk_rope_head_dim: int
    v_head_dim: int
    rope: RopeConfig
    scale: float                    # qk_head_dim^-0.5 (x yarn mscale^2)
    rms_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    quant: Optional[QuantConfig] = None
    tp_size: int = 1
    backend: str = "auto"           # decode kernel: auto|pallas|xla
    # DSA lightning indexer (DeepSeek V3.2; reference sparse/dsa.py):
    # {"index_n_heads", "index_head_dim", "index_topk"} — decode attends
    # over only the indexer's top-k tokens; prefill stays dense (exact
    # whenever the context fits in index_topk)
    sparse: Optional[dict] = None

    def __post_init__(self):
        if self.backend == "auto":
            import os as _os
            from tensorrt_llm_tpu.utils import is_tpu_backend
            if _os.environ.get("TLLM_PALLAS_INTERPRET") == "1":
                self.backend = "pallas_interpret"   # CI: real kernels on CPU
            else:
                self.backend = "pallas" if is_tpu_backend() else "xla"
        assert self.num_heads % self.tp_size == 0
        self.n_local_heads = self.num_heads // self.tp_size
        self.qk_head_dim = self.qk_nope_head_dim + self.qk_rope_head_dim
        method = lambda name: make_linear_method(self.quant, name)
        H = self.hidden_size
        if self.q_lora_rank is not None:
            self.q_a = Linear(H, self.q_lora_rank, False, self.dtype,
                              method("q_a_proj"), tp_mode="none")
            self.q_b = Linear(self.q_lora_rank,
                              self.num_heads * self.qk_head_dim, False,
                              self.dtype, method("q_b_proj"),
                              tp_mode="column", tp_size=self.tp_size)
        else:
            self.q_proj = Linear(H, self.num_heads * self.qk_head_dim, False,
                                 self.dtype, method("q_proj"),
                                 tp_mode="column", tp_size=self.tp_size)
        self.kv_a = Linear(H, self.kv_lora_rank + self.qk_rope_head_dim,
                           False, self.dtype, method("kv_a_proj"),
                           tp_mode="none")
        self.o = Linear(self.num_heads * self.v_head_dim, H, False,
                        self.dtype, method("o_proj"), tp_mode="row",
                        tp_size=self.tp_size)
        if self.sparse is not None:
            assert self.q_lora_rank is not None, \
                "the DSA indexer taps the compressed q (reference wq_b " \
                "input is q_lora, dsa.py:869)"
            self.idx_heads = int(self.sparse.get("index_n_heads", 64))
            self.idx_dim = int(self.sparse.get("index_head_dim", 128))
            self.idx_topk = int(self.sparse.get("index_topk", 2048))
            # indexer projections are unquantized (reference keeps
            # weights_proj fp32 and wq_b/wk at model dtype)
            self.idx_wq_b = Linear(self.q_lora_rank,
                                   self.idx_heads * self.idx_dim, False,
                                   self.dtype, make_linear_method(None, "x"),
                                   tp_mode="none")
            self.idx_wk = Linear(H, self.idx_dim, False, self.dtype,
                                 make_linear_method(None, "x"),
                                 tp_mode="none")
            self.idx_weights = Linear(H, self.idx_heads, False, self.dtype,
                                      make_linear_method(None, "x"),
                                      tp_mode="none")

    # ---- params ---------------------------------------------------------------
    def init(self, key) -> Dict:
        keys = jax.random.split(key, 5)
        H = self.hidden_size
        L, R, N, V = (self.kv_lora_rank, self.qk_rope_head_dim,
                      self.qk_nope_head_dim, self.v_head_dim)
        std = 0.5 / (H ** 0.5)
        rnd = lambda k, shape, s=std: jax.random.normal(
            k, shape, jnp.float32) * s
        kv_a_w = rnd(keys[1], (H, L + R))
        kv_b_w = rnd(keys[2], (L, self.num_heads * (N + V)), 0.5 / L ** 0.5)
        o_w = rnd(keys[3], (self.num_heads * V, H))
        indexer = None
        if self.sparse is not None:
            ik = jax.random.split(keys[4], 4)
            indexer = {
                "wq_b": rnd(ik[0], (self.q_lora_rank,
                                    self.idx_heads * self.idx_dim),
                            0.5 / self.q_lora_rank ** 0.5),
                "wk": rnd(ik[1], (H, self.idx_dim)),
                "k_norm_w": jnp.ones((self.idx_dim,), jnp.float32),
                "k_norm_b": jnp.zeros((self.idx_dim,), jnp.float32),
                "weights_proj": rnd(ik[2], (H, self.idx_heads)),
            }
        if self.q_lora_rank is not None:
            qa = rnd(keys[4], (H, self.q_lora_rank))
            qb = rnd(keys[0], (self.q_lora_rank,
                               self.num_heads * self.qk_head_dim),
                     0.5 / self.q_lora_rank ** 0.5)
            return self.from_float(kv_a_w, kv_b_w, o_w,
                                   jnp.ones((L,), jnp.float32),
                                   q_a_w=qa, q_b_w=qb,
                                   q_norm=jnp.ones((self.q_lora_rank,),
                                                   jnp.float32),
                                   indexer=indexer)
        q_w = rnd(keys[0], (H, self.num_heads * self.qk_head_dim))
        return self.from_float(kv_a_w, kv_b_w, o_w,
                               jnp.ones((L,), jnp.float32), q_w=q_w,
                               indexer=indexer)

    def from_float(self, kv_a_w, kv_b_w, o_w, kv_norm, q_w=None, q_a_w=None,
                   q_b_w=None, q_norm=None, indexer=None) -> Dict:
        """All weights [in, out] float.  kv_b_w [L, H*(N+V)] is split into the
        absorbed per-head factors W_uk [H, N, L] / W_uv [H, L, V]."""
        L, N, V = self.kv_lora_rank, self.qk_nope_head_dim, self.v_head_dim
        kv_b = kv_b_w.reshape(L, self.num_heads, N + V)
        w_uk = jnp.transpose(kv_b[:, :, :N], (1, 2, 0))   # [H, N, L]
        w_uv = jnp.transpose(kv_b[:, :, N:], (1, 0, 2))   # [H, L, V]
        p = {
            "kv_a": self.kv_a.quantize_from_float(kv_a_w),
            "kv_norm": kv_norm.astype(jnp.float32),
            "w_uk": w_uk.astype(self.dtype),
            "w_uv": w_uv.astype(self.dtype),
            "o": self.o.quantize_from_float(o_w),
        }
        if self.q_lora_rank is not None:
            p["q_a"] = self.q_a.quantize_from_float(q_a_w)
            p["q_norm"] = q_norm.astype(jnp.float32)
            p["q_b"] = self.q_b.quantize_from_float(q_b_w)
        else:
            p["q"] = self.q_proj.quantize_from_float(q_w)
        if self.sparse is not None:
            assert indexer is not None, "DSA indexer weights missing"
            p["indexer"] = {
                "wq_b": self.idx_wq_b.quantize_from_float(indexer["wq_b"]),
                "wk": self.idx_wk.quantize_from_float(indexer["wk"]),
                "k_norm_w": jnp.asarray(indexer["k_norm_w"], jnp.float32),
                "k_norm_b": (jnp.zeros((self.idx_dim,), jnp.float32)
                             if indexer.get("k_norm_b") is None
                             else jnp.asarray(indexer["k_norm_b"],
                                              jnp.float32)),
                "weights_proj": self.idx_weights.quantize_from_float(
                    indexer["weights_proj"]),
            }
        return p

    def param_specs(self) -> Dict:
        p = {
            "kv_a": self.kv_a.param_specs(),
            "kv_norm": P(None),
            "w_uk": P("tp", None, None),
            "w_uv": P("tp", None, None),
            "o": self.o.param_specs(),
        }
        if self.q_lora_rank is not None:
            p["q_a"] = self.q_a.param_specs()
            p["q_norm"] = P(None)
            p["q_b"] = self.q_b.param_specs()
        else:
            p["q"] = self.q_proj.param_specs()
        if self.sparse is not None:
            # the indexer is MQA-like (one shared key head) — replicate
            p["indexer"] = {
                "wq_b": self.idx_wq_b.param_specs(),
                "wk": self.idx_wk.param_specs(),
                "k_norm_w": P(None), "k_norm_b": P(None),
                "weights_proj": self.idx_weights.param_specs(),
            }
        return p

    # ---- forward ----------------------------------------------------------------
    def __call__(
        self,
        params: Dict,
        x: jax.Array,                 # [T, hidden]
        rope_tables: Tuple[jax.Array, jax.Array],
        kv_cache: jax.Array,          # latent pool [NB, 1, BS, L+R]
                                      # (DSA: (latent pool, indexer pool))
        meta: AttentionMetadata,
    ) -> Tuple[jax.Array, jax.Array]:
        idx_cache = None
        if self.sparse is not None:
            kv_cache, idx_cache = kv_cache
        T = x.shape[0]
        Hl = self.n_local_heads
        L, R, N = self.kv_lora_rank, self.qk_rope_head_dim, self.qk_nope_head_dim

        cq = None
        if self.q_lora_rank is not None:
            cq = rms_norm(self.q_a(params["q_a"], x), params["q_norm"],
                          self.rms_eps)
            q = self.q_b(params["q_b"], cq)
        else:
            q = self.q_proj(params["q"], x)
        q = q.reshape(T, Hl, self.qk_head_dim)
        q_nope, q_pe = q[..., :N], q[..., N:]

        ckv_full = self.kv_a(params["kv_a"], x)           # [T, L+R]
        ckv = rms_norm(ckv_full[:, :L], params["kv_norm"], self.rms_eps)
        k_pe = ckv_full[:, None, L:]                      # [T, 1, R]

        cos_t, sin_t = rope_tables
        q_pe, k_pe = apply_rope(q_pe, k_pe, meta.positions, cos_t, sin_t,
                                interleaved=self.rope.interleaved)

        # absorb W_uk into the query: [T,H,N] x [H,N,L] -> [T,H,L]
        q_lat = jnp.einsum("thn,hnl->thl", q_nope.astype(jnp.float32),
                           params["w_uk"].astype(jnp.float32))
        q_eff = jnp.concatenate([q_lat.astype(x.dtype),
                                 q_pe.astype(x.dtype)], axis=-1)

        latents = jnp.concatenate(
            [ckv.astype(kv_cache.dtype), k_pe[:, 0].astype(kv_cache.dtype)],
            axis=-1)
        # pool rows are lane-tile padded (ModelConfig.kv_pool_dim); zero-pad
        # the query too so the pad channels cancel out of the scores
        pad = kv_cache.shape[-1] - (L + R)
        if pad:
            latents = jnp.pad(latents, ((0, 0), (0, pad)))
            q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, pad)))
        kv_cache = write_latent_cache(kv_cache, latents, meta.slot_mapping)

        sel = None
        if self.sparse is not None:
            from tensorrt_llm_tpu.ops.dsa import (
                dsa_decode_select, rotate_activation, write_indexer_cache)
            ip = params["indexer"]
            Di, Hi = self.idx_dim, self.idx_heads
            # indexer K: wk -> LayerNorm -> rope(first R dims, neox) ->
            # Hadamard rotate (reference _qk_projection_and_rope /
            # _prep_q_or_k, dsa.py:1528-1550)
            k_idx = self.idx_wk(ip["wk"], x).astype(jnp.float32)
            mu = k_idx.mean(-1, keepdims=True)
            var = k_idx.var(-1, keepdims=True)
            k_idx = ((k_idx - mu) * jax.lax.rsqrt(var + 1e-6)
                     * ip["k_norm_w"] + ip["k_norm_b"]).astype(x.dtype)
            q_idx = self.idx_wq_b(ip["wq_b"], cq).reshape(T, Hi, Di)
            qi_pe, qi_no = q_idx[..., :R], q_idx[..., R:]
            ki_pe, ki_no = k_idx[:, None, :R], k_idx[:, R:]
            # indexer rope is NOT interleaved (is_neox=True, dsa.py:900)
            qi_pe, ki_pe = apply_rope(qi_pe, ki_pe, meta.positions,
                                      cos_t, sin_t, interleaved=False)
            q_idx = rotate_activation(
                jnp.concatenate([qi_pe.astype(x.dtype), qi_no], -1))
            k_idx = rotate_activation(
                jnp.concatenate([ki_pe[:, 0].astype(x.dtype), ki_no], -1))
            idx_cache = write_indexer_cache(idx_cache, k_idx,
                                            meta.slot_mapping)
            # weights carry softmax_scale * Hi**-0.5 (dsa.py:908)
            w = self.idx_weights(ip["weights_proj"], x).astype(
                jnp.float32) * (Di ** -0.5) * (Hi ** -0.5)
            if meta.mode != "prefill":
                sel = dsa_decode_select(q_idx, w, idx_cache,
                                        meta.block_tables, meta.kv_lens,
                                        self.idx_topk,
                                        backend=self.backend)
            else:
                # chunked sparse prefill: per-query top-k visibility mask
                # (reference prefill indexer path, dsa.py:1355-1423)
                from tensorrt_llm_tpu.ops.dsa import dsa_prefill_mask
                sparse_mask = dsa_prefill_mask(
                    q_idx, w, idx_cache, meta.block_tables[0],
                    meta.kv_lens[0], meta.q_offset, self.idx_topk)

        if sel is not None:
            from tensorrt_llm_tpu.ops.dsa import mla_sparse_decode_xla
            out_lat = mla_sparse_decode_xla(
                q_eff, kv_cache, meta.block_tables, meta.kv_lens, sel,
                self.scale, L)
        elif meta.mode == "prefill" and self.sparse is not None:
            out_lat = mla_prefill_xla(q_eff, kv_cache, meta.block_tables[0],
                                      meta.kv_lens[0], meta.q_offset,
                                      self.scale, L,
                                      extra_mask=sparse_mask)
        elif meta.mode == "prefill" and self.backend.startswith("pallas"):
            from tensorrt_llm_tpu.ops.mla_pallas import mla_prefill_pallas
            out_lat = mla_prefill_pallas(
                q_eff, kv_cache, meta.block_tables[0],
                meta.kv_lens[0], meta.q_offset, self.scale, L,
                interpret=self.backend == "pallas_interpret")
        elif meta.mode == "prefill":
            out_lat = mla_prefill_xla(q_eff, kv_cache, meta.block_tables[0],
                                      meta.kv_lens[0], meta.q_offset,
                                      self.scale, L)
        elif self.backend.startswith("pallas"):
            from tensorrt_llm_tpu.ops.mla_pallas import mla_decode_pallas
            out_lat = mla_decode_pallas(
                q_eff, kv_cache, meta.block_tables,
                meta.kv_lens, self.scale, L,
                interpret=self.backend == "pallas_interpret")
        else:
            out_lat = mla_decode_xla(q_eff, kv_cache, meta.block_tables,
                                     meta.kv_lens, self.scale, L)

        # absorb W_uv on the output side: [T,H,L] x [H,L,V] -> [T,H,V]
        out = jnp.einsum("thl,hlv->thv", out_lat.astype(jnp.float32),
                         params["w_uv"].astype(jnp.float32)).astype(x.dtype)
        out = out.reshape(T, Hl * self.v_head_dim)
        cache_out = (kv_cache if self.sparse is None
                     else (kv_cache, idx_cache))
        return self.o(params["o"], out), cache_out
