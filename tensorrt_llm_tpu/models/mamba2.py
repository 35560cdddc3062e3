"""Mamba2 (state-space) causal LM.

Counterpart of the reference's SSM stack: selective-scan kernels
(`cpp/tensorrt_llm/kernels/selectiveScan/`, `causalConv1d`), RNN state
management (`batch_manager/rnnStateManager.cpp`, Python
`mamba_cache_manager.py`) and the Nemotron-H-class hybrid models.  Blocks are
norm + Mamba2 mixer (no separate MLP); state is slot-addressed — each
sequence owns one slot in per-layer conv-history and SSM-state pools for its
lifetime, so there are no paged blocks to manage for SSM layers.

Prefill runs the chunked SSD scan (ops/ssm.py) with the carried state as the
initial chunk state — chunked prefill is exact, unlike recompute-based SSM
servers.  Decode is the single-token recurrence.  Numerics mirror HF
`modeling_mamba2.py` `torch_forward` for checkpoint parity.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.embedding import Embedding
from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.ops.norms import rms_norm
from tensorrt_llm_tpu.ops.ssm import (
    causal_conv1d_chunk,
    causal_conv1d_step,
    ssd_chunked,
    ssd_decode_step,
)

# out-of-range slot rows (padding) scatter-drop
PAD_SLOT = np.int32(2**30)


class Mamba2Mixer:
    """One Mamba2 mixer (HF Mamba2Mixer torch_forward semantics)."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.tp = cfg.mapping.tp_size
        Hg = cfg.ssm_num_heads or 8
        Gg = cfg.ssm_n_groups
        assert Hg % self.tp == 0 and Gg % self.tp == 0, (
            "SSM TP needs heads and groups divisible by tp")
        # LOCAL (per-shard) dims — the mixer body runs inside shard_map
        self.H = Hg // self.tp
        self.G = Gg // self.tp
        self.H_global, self.G_global = Hg, Gg
        self.P = cfg.ssm_head_dim
        self.N = cfg.ssm_state_size
        self.K = cfg.ssm_conv_kernel
        self.chunk = cfg.ssm_chunk_size
        self.d_inner = self.H * self.P
        self.d_inner_global = Hg * self.P
        self.conv_dim = self.d_inner + 2 * self.G * self.N
        self.conv_dim_global = self.d_inner_global + 2 * Gg * self.N
        self.proj_dim = self.d_inner + self.conv_dim + self.H
        self.proj_dim_global = (self.d_inner_global + self.conv_dim_global
                                + Hg)

    # ---- TP layout ---------------------------------------------------------------
    def _interleave_cols(self, mat, segs):
        """Permute the last axis from segment-major global layout to the
        per-rank-contiguous layout the column shards expect (same pattern as
        the fused qkv interleave)."""
        if self.tp == 1 or mat is None:
            return mat
        idx = []
        for r in range(self.tp):
            for lo, hi in segs:
                per = (hi - lo) // self.tp
                idx.extend(range(lo + r * per, lo + (r + 1) * per))
        return mat[..., np.array(idx)]

    def _proj_segs(self):
        dg, cg = self.d_inner_global, self.conv_dim_global
        return [(0, dg), (dg, dg + cg), (dg + cg, self.proj_dim_global)]

    def _conv_segs(self):
        dg = self.d_inner_global
        gn = self.G_global * self.N
        return [(0, dg), (dg, dg + gn), (dg + gn, dg + 2 * gn)]

    def shard_in_proj(self, w):
        """[Hs, proj_dim] global -> per-rank [z_r|xbc_r|dt_r] columns, with
        the xbc segment itself interleaved [x_r|B_r|C_r]."""
        if self.tp == 1 or w is None:
            return w
        dg, cg = self.d_inner_global, self.conv_dim_global
        xbc = self._interleave_cols(w[..., dg:dg + cg], self._conv_segs())
        w = jnp.concatenate([w[..., :dg], xbc, w[..., dg + cg:]], axis=-1)
        return self._interleave_cols(w, self._proj_segs())

    def shard_conv(self, t):
        return self._interleave_cols(t, self._conv_segs())

    def param_specs(self) -> Dict:
        from tensorrt_llm_tpu.parallel.ops import TP_AXES
        from jax.sharding import PartitionSpec as P
        return {"in_proj": P(None, TP_AXES), "conv_w": P(None, TP_AXES),
                "conv_b": P(TP_AXES), "A_log": P(TP_AXES), "D": P(TP_AXES),
                "dt_bias": P(TP_AXES), "gated_norm": P(TP_AXES),
                "out_proj": P(TP_AXES, None)}

    def cache_specs(self):
        from tensorrt_llm_tpu.parallel.ops import TP_AXES
        from jax.sharding import PartitionSpec as P
        return (P(None, None, TP_AXES), P(None, TP_AXES, None, None))

    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        Hs = self.cfg.hidden_size
        std = 0.5 / Hs ** 0.5
        return {
            "in_proj": self.shard_in_proj(
                (jax.random.normal(k1, (Hs, self.proj_dim_global),
                                   jnp.float32) * std
                 ).astype(self.cfg.dtype)),
            "conv_w": self.shard_conv(
                jax.random.normal(k2, (self.K, self.conv_dim_global),
                                  jnp.float32) * 0.2),
            "conv_b": jnp.zeros((self.conv_dim_global,), jnp.float32),
            "A_log": jnp.log(jnp.arange(1, self.H_global + 1,
                                        dtype=jnp.float32)),
            "D": jnp.ones((self.H_global,), jnp.float32),
            "dt_bias": jnp.ones((self.H_global,), jnp.float32),
            "gated_norm": jnp.ones((self.d_inner_global,), jnp.float32),
            "out_proj": (jax.random.normal(
                k3, (self.d_inner_global, Hs), jnp.float32)
                * (0.5 / self.d_inner_global ** 0.5)
            ).astype(self.cfg.dtype),
        }

    def _split_proj(self, zxbcdt):
        z = zxbcdt[:, : self.d_inner]
        xbc = zxbcdt[:, self.d_inner: self.d_inner + self.conv_dim]
        dt = zxbcdt[:, self.d_inner + self.conv_dim:]
        return z, xbc, dt

    def _split_xbc(self, xbc):
        x = xbc[:, : self.d_inner]
        B = xbc[:, self.d_inner: self.d_inner + self.G * self.N]
        C = xbc[:, self.d_inner + self.G * self.N:]
        return x, B, C

    def _expand_groups(self, t):  # [T, G, N] -> [T, H, N]
        return jnp.repeat(t, self.H // self.G, axis=1)

    def _finish(self, params, y, z, dtype):
        # gated RMSNorm (HF MambaRMSNormGated): gate applied pre-variance;
        # under TP the variance reduces over the FULL d_inner (psum)
        yf = y.reshape(y.shape[0], self.d_inner)
        yf = yf * jax.nn.silu(z.astype(jnp.float32))
        sq = jnp.sum(yf * yf, axis=-1, keepdims=True)
        if self.tp > 1:
            from tensorrt_llm_tpu.parallel.ops import tp_all_reduce
            sq = tp_all_reduce(sq)
        var = sq / self.d_inner_global
        yf = yf * jax.lax.rsqrt(var + self.cfg.rms_eps)
        yf = yf * params["gated_norm"][None, :]
        out = jnp.dot(yf.astype(dtype), params["out_proj"].astype(dtype),
                      preferred_element_type=jnp.float32)
        if self.tp > 1:
            from tensorrt_llm_tpu.parallel.ops import tp_all_reduce
            out = tp_all_reduce(out)
        return out.astype(dtype)

    def __call__(self, params, x, cache, meta: AttentionMetadata):
        """cache = (conv_pool [S, K-1, conv_dim] bf16,
                    ssm_pool [S, H, P, N] f32)."""
        conv_pool, ssm_pool = cache
        Tb = x.shape[0]
        zxbcdt = jnp.dot(x, params["in_proj"].astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        z, xbc, dt_raw = self._split_proj(zxbcdt)
        A = -jnp.exp(params["A_log"])

        if meta.mode == "prefill":
            slot = meta.seq_slots[0]
            # fresh sequences (q_offset==0) start from zero state
            fresh = meta.q_offset == 0
            hist = jnp.where(fresh, 0.0,
                             conv_pool[slot].astype(jnp.float32)
                             ).astype(x.dtype)
            prev = jnp.where(fresh, 0.0, ssm_pool[slot])
            conv_out, new_hist = causal_conv1d_chunk(
                xbc, params["conv_w"], params["conv_b"], hist)
            # zero padded rows so they can't pollute the carried state
            valid = (jnp.arange(Tb) < (meta.kv_lens[0] - meta.q_offset)
                     )[:, None]
            conv_out = jnp.where(valid, jax.nn.silu(
                conv_out.astype(jnp.float32)), 0.0).astype(x.dtype)
            xs, B, C = self._split_xbc(conv_out)
            dt = jax.nn.softplus(dt_raw.astype(jnp.float32)
                                 + params["dt_bias"][None, :])
            dt = jnp.where(valid, dt, 0.0)  # padded rows: no state effect
            y, final_state = ssd_chunked(
                xs.reshape(Tb, self.H, self.P), dt, A,
                self._expand_groups(B.reshape(Tb, self.G, self.N)),
                self._expand_groups(C.reshape(Tb, self.G, self.N)),
                params["D"], prev, self.chunk)
            # carry state: conv history must hold the last K-1 VALID inputs;
            # with block-aligned chunks padding only trails the final chunk,
            # where the valid tail is at rows [L-K+1, L)
            L = meta.kv_lens[0] - meta.q_offset
            full = jnp.concatenate([hist, xbc], axis=0)
            idx = jnp.clip(L + jnp.arange(self.K - 1), 0,
                           full.shape[0] - 1)
            new_hist = full[idx]
            conv_pool = conv_pool.at[slot].set(
                new_hist.astype(conv_pool.dtype))
            ssm_pool = ssm_pool.at[slot].set(final_state)
            return (self._finish(params, y, z, x.dtype),
                    (conv_pool, ssm_pool))

        # decode: batched single-token recurrence at seq_slots rows
        slots = jnp.where(meta.seq_slots >= conv_pool.shape[0],
                          conv_pool.shape[0] - 1, meta.seq_slots)
        hist = conv_pool[slots].astype(x.dtype)        # [B, K-1, conv_dim]
        state = ssm_pool[slots]                        # [B, H, P, N]
        conv_out, new_hist = causal_conv1d_step(
            xbc, params["conv_w"], params["conv_b"], hist)
        conv_out = jax.nn.silu(conv_out.astype(jnp.float32)).astype(x.dtype)
        xs, B, C = self._split_xbc(conv_out)
        dt = jax.nn.softplus(dt_raw.astype(jnp.float32)
                             + params["dt_bias"][None, :])
        y, new_state = ssd_decode_step(
            xs.reshape(Tb, self.H, self.P), dt, A,
            self._expand_groups(B.reshape(Tb, self.G, self.N)),
            self._expand_groups(C.reshape(Tb, self.G, self.N)),
            params["D"], state)
        pad_guard = meta.seq_slots < conv_pool.shape[0]
        wr = jnp.where(pad_guard, meta.seq_slots, conv_pool.shape[0])
        conv_pool = conv_pool.at[wr].set(new_hist.astype(conv_pool.dtype),
                                         mode="drop")
        ssm_pool = ssm_pool.at[wr].set(new_state, mode="drop")
        return self._finish(params, y, z, x.dtype), (conv_pool, ssm_pool)


@register_auto_model("Mamba2ForCausalLM")
class Mamba2ForCausalLM:
    """Pure-Mamba2 LM (HF backbone.* naming)."""

    def __init__(self, cfg: ModelConfig):
        assert cfg.mapping.pp_size == 1 and cfg.mapping.cp_size == 1, \
            "Mamba2 PP/CP sharding lands in a later round"
        self.cfg = cfg
        self.embedding = Embedding(cfg.vocab_size, cfg.hidden_size, cfg.dtype)
        self.mixers = [Mamba2Mixer(cfg) for _ in range(cfg.num_layers)]

    # ---- engine hooks -----------------------------------------------------------
    def make_layer_caches(self, kv_manager):
        """Slot-addressed state pools instead of paged KV (GLOBAL shapes;
        the engine shards the channel/head axes per cache_specs)."""
        S = kv_manager.slots.max_slots
        m = self.mixers[0]
        return [(jnp.zeros((S, m.K - 1, m.conv_dim_global), jnp.bfloat16),
                 jnp.zeros((S, m.H_global, m.P, m.N), jnp.float32))
                for _ in range(self.cfg.num_layers)]

    def cache_specs(self, pools=None, default_fn=None):
        return [self.mixers[i].cache_specs()
                for i in range(self.cfg.num_layers)]

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.cfg.num_layers + 2)
        params = {
            "embedding": self.embedding.init(keys[0]),
            "final_norm": jnp.ones((self.cfg.hidden_size,), jnp.float32),
            "layers": [],
        }
        for i, m in enumerate(self.mixers):
            params["layers"].append({
                "norm": jnp.ones((self.cfg.hidden_size,), jnp.float32),
                "mixer": m.init(keys[i + 1]),
            })
        if not self.cfg.tie_word_embeddings:
            params["lm_head"] = (jax.random.normal(
                keys[-1], (self.cfg.hidden_size, self.cfg.vocab_size),
                jnp.float32) * 0.02).astype(self.cfg.dtype)
        return params

    def param_specs(self):
        from jax.sharding import PartitionSpec as P
        specs = {
            "embedding": jax.tree.map(lambda _: P(),
                                      self.embedding.init(
                                          jax.random.PRNGKey(0))),
            "final_norm": P(None),
            "layers": [{"norm": P(None), "mixer": m.param_specs()}
                       for m in self.mixers],
        }
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = P(None, None)
        return specs

    # ---- forward ------------------------------------------------------------------
    def forward(self, params, input_ids, kv_caches, meta: AttentionMetadata,
                logit_indices=None, return_hidden: bool = False,
                capture: str = "final", input_embeds=None):
        cfg = self.cfg
        x = (input_embeds.astype(cfg.dtype) if input_embeds is not None
             else self.embedding(params["embedding"], input_ids))
        new_caches = []
        for i, mixer in enumerate(self.mixers):
            h = rms_norm(x, params["layers"][i]["norm"], cfg.rms_eps)
            out, cache = mixer(params["layers"][i]["mixer"], h,
                               kv_caches[i], meta)
            x = (x.astype(jnp.float32) + out.astype(jnp.float32)
                 ).astype(x.dtype)
            new_caches.append(cache)
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        if logit_indices is not None:
            x = x[logit_indices]
        if cfg.tie_word_embeddings:
            logits = jnp.dot(x, params["embedding"]["weight"].T.astype(x.dtype),
                             preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(x, params["lm_head"].astype(x.dtype),
                             preferred_element_type=jnp.float32)
        if return_hidden:
            return logits, x, new_caches
        return logits, new_caches

    # ---- HF weights -----------------------------------------------------------
    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        cfg = self.cfg

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = {
            "embedding": self.embedding.from_float(
                arr("backbone.embeddings.weight")),
            "final_norm": arr("backbone.norm_f.weight"),
            "layers": [],
        }
        for i, m in enumerate(self.mixers):
            pre = f"backbone.layers.{i}."
            conv_w = arr(pre + "mixer.conv1d.weight")  # [conv_dim, 1, K]
            lp = {
                "norm": arr(pre + "norm.weight"),
                "mixer": {
                    "in_proj": m.shard_in_proj(
                        arr(pre + "mixer.in_proj.weight").T.astype(
                            cfg.dtype)),
                    "conv_w": m.shard_conv(
                        jnp.transpose(conv_w[:, 0, :], (1, 0))),
                    "conv_b": m.shard_conv(arr(pre + "mixer.conv1d.bias")),
                    "A_log": arr(pre + "mixer.A_log"),
                    "D": arr(pre + "mixer.D"),
                    "dt_bias": arr(pre + "mixer.dt_bias"),
                    "gated_norm": arr(pre + "mixer.norm.weight"),
                    "out_proj": arr(pre + "mixer.out_proj.weight").T.astype(
                        cfg.dtype),
                },
            }
            if arr(pre + "mixer.conv1d.bias") is None:
                lp["mixer"]["conv_b"] = jnp.zeros((m.conv_dim_global,),
                                                  jnp.float32)
            params["layers"].append(lp)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = arr("lm_head.weight").T.astype(cfg.dtype)
        return params
