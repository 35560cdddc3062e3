"""Qwen3-Next hybrid: Gated DeltaNet linear attention + gated full
attention + Qwen-MoE (shared expert with sigmoid gate).

Counterpart of the reference's `_torch/models/modeling_qwen3_next.py`:
`layer_types` alternates ``linear_attention`` (Gated DeltaNet — the delta
rule with per-head log-decay gates, a causal depthwise conv on the mixed
qkv, l2-normalized q/k, and a z-gated RMSNorm output) and
``full_attention`` (Qwen3 attention whose q projection also emits a
per-head sigmoid output gate, partial rotary), each followed by a MoE FFN
with a sigmoid-gated shared expert.

The DeltaNet chunked prefill follows the WY-representation form of the
recurrence (HF `torch_chunk_gated_delta_rule`), with the sequential
in-chunk triangular inversion replaced by `solve_triangular` — exact for
any engine chunking since the carried state enters only through the
inter-chunk terms.  States live in the slot-addressed pools shared with
the Mamba2/lightning machinery: (conv history [K-1, conv_dim], recurrent
[Hv, Dk, Dv])."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.mlp import GatedMLP
from tensorrt_llm_tpu.layers.moe import MoE
from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.nemotron_h import NemotronHForCausalLM
from tensorrt_llm_tpu.ops.rope import apply_rope, make_rope_tables
from tensorrt_llm_tpu.ops.norms import rms_norm
from tensorrt_llm_tpu.ops.ssm import causal_conv1d_chunk, causal_conv1d_step


def _l2norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)


def chunk_gated_delta_rule(q, k, v, g, beta, state, chunk: int = 64):
    """Exact chunked gated delta rule (HF torch_chunk_gated_delta_rule).

    q/k [T, H, Dk] (l2-normalized), v [T, H, Dv], g [T, H] log-decay,
    beta [T, H]; state [H, Dk, Dv] carried in.  Padded rows must arrive
    with beta=0 and g=0.  Returns (out [T, H, Dv], new state)."""
    T, H, Dk = q.shape
    Dv = v.shape[-1]
    pad = (-T) % chunk
    if pad:
        zq = jnp.zeros((pad, H, Dk), q.dtype)
        q = jnp.concatenate([q, zq])
        k = jnp.concatenate([k, zq])
        v = jnp.concatenate([v, jnp.zeros((pad, H, Dv), v.dtype)])
        g = jnp.concatenate([g, jnp.zeros((pad, H), g.dtype)])
        beta = jnp.concatenate([beta, jnp.zeros((pad, H), beta.dtype)])
    n = q.shape[0] // chunk
    scale = Dk ** -0.5

    def to_chunks(x):
        return x.reshape(n, chunk, *x.shape[1:])

    qc = to_chunks(q) * scale
    kc = to_chunks(k)
    vc = to_chunks(v)
    gc = jnp.cumsum(to_chunks(g), axis=1)       # [n, B, H]
    bc = to_chunks(beta)
    kb = kc * bc[..., None]
    vb = vc * bc[..., None]

    tri = jnp.tril(jnp.ones((chunk, chunk), bool), -1)      # strictly lower
    eye = jnp.eye(chunk, dtype=jnp.float32)
    dgap = gc[:, :, None, :] - gc[:, None, :, :]            # [n, B, B, H]
    decay_sl = jnp.where(tri[None, :, :, None], jnp.exp(dgap), 0.0)
    # WY form: T = (I + strictly-lower decay-weighted k_beta k^T)^(-1)
    # (HF builds A = -that and inverts I - A by forward substitution)
    A = jnp.einsum("nihd,njhd->nijh", kb, kc) * decay_sl
    A = jnp.moveaxis(A, -1, 1)                              # [n, H, B, B]
    Tm = jax.scipy.linalg.solve_triangular(
        jnp.broadcast_to(eye, A.shape) + A,
        jnp.broadcast_to(eye, A.shape), lower=True)
    v2 = jnp.einsum("nhij,njhd->nihd", Tm, vb)              # attn @ v_beta
    kcum = jnp.einsum("nhij,njhd->nihd", Tm,
                      kb * jnp.exp(gc)[..., None])          # attn @ (kb e^g)

    # q·k attention with decay, lower-triangular INCLUDING the diagonal
    # (diagonal decay exp(0) = 1)
    diag = (jnp.arange(chunk)[:, None] == jnp.arange(chunk)[None, :])
    decay_tril = decay_sl + jnp.where(diag[None, :, :, None], 1.0, 0.0)
    attn_w = jnp.einsum("nihd,njhd->nijh", qc, kc) * decay_tril

    def body(st, xs):
        qi, ki, v2i, kcumi, gci, attn_i = xs
        v_prime = jnp.einsum("ihd,hde->ihe", kcumi, st)
        v_new = v2i - v_prime
        inter = jnp.einsum("ihd,hde->ihe", qi * jnp.exp(gci)[..., None], st)
        out = inter + jnp.einsum("ijh,jhe->ihe", attn_i, v_new)
        glast = gci[-1]                                     # [H]
        st = st * jnp.exp(glast)[:, None, None] \
            + jnp.einsum("jhd,jhe->hde",
                         ki * jnp.exp(glast[None, :] - gci)[..., None],
                         v_new)
        return st, out

    state, outs = jax.lax.scan(
        body, state.astype(jnp.float32),
        (qc, kc, v2, kcum, gc, attn_w))
    out = outs.reshape(n * chunk, H, Dv)[:T]
    return out, state


class GatedDeltaNetMixer:
    """Gated DeltaNet (HF Qwen3NextGatedDeltaNet)."""

    def __init__(self, cfg: ModelConfig):
        ex = cfg.extra
        self.hidden = cfg.hidden_size
        self.Hv = ex["linear_num_value_heads"]
        self.Hk = ex["linear_num_key_heads"]
        self.Dk = ex["linear_key_head_dim"]
        self.Dv = ex["linear_value_head_dim"]
        self.K = ex.get("linear_conv_kernel_dim", 4)
        self.key_dim = self.Dk * self.Hk
        self.value_dim = self.Dv * self.Hv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.rep = self.Hv // self.Hk
        self.eps = cfg.rms_eps
        self.dtype = cfg.dtype

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        ks = jax.random.split(key, 4)
        HID = self.hidden
        qkvz = 2 * self.key_dim + 2 * self.value_dim
        std = 0.5 / HID ** 0.5
        return {
            "in_qkvz": (jax.random.normal(ks[0], (HID, qkvz), jnp.float32)
                        * std).astype(self.dtype),
            "in_ba": (jax.random.normal(ks[1], (HID, 2 * self.Hv),
                                        jnp.float32) * std
                      ).astype(self.dtype),
            "conv_w": jax.random.normal(ks[2], (self.K, self.conv_dim),
                                        jnp.float32) * 0.2,
            "A_log": jnp.log(jnp.linspace(1.0, 8.0, self.Hv)),
            "dt_bias": jnp.ones((self.Hv,), jnp.float32),
            "norm": jnp.ones((self.Dv,), jnp.float32),
            "out": (jax.random.normal(ks[3], (self.value_dim, HID),
                                      jnp.float32) * std
                    ).astype(self.dtype),
        }

    def param_specs(self) -> Dict:
        return {"in_qkvz": P(None, None), "in_ba": P(None, None),
                "conv_w": P(None, None), "A_log": P(None),
                "dt_bias": P(None), "norm": P(None), "out": P(None, None)}

    def cache_specs(self):
        return (P(None, None, None), P(None, None, None, None))

    def load_hf(self, arr, pre: str) -> Dict:
        conv = arr(pre + "conv1d.weight")        # [conv_dim, 1, K]
        return {
            "in_qkvz": arr(pre + "in_proj_qkvz.weight").T.astype(self.dtype),
            "in_ba": arr(pre + "in_proj_ba.weight").T.astype(self.dtype),
            "conv_w": jnp.transpose(conv[:, 0, :], (1, 0)),
            "A_log": arr(pre + "A_log"),
            "dt_bias": arr(pre + "dt_bias"),
            "norm": arr(pre + "norm.weight"),
            "out": arr(pre + "out_proj.weight").T.astype(self.dtype),
        }

    # ---- projections -------------------------------------------------------------
    def _project(self, params, x):
        """Returns (mixed_qkv [T, conv_dim] pre-conv, z [T, Hv, Dv],
        b [T, Hv], a [T, Hv]) in the HF head ordering."""
        T = x.shape[0]
        qkvz = jnp.dot(x, params["in_qkvz"],
                       preferred_element_type=jnp.float32)
        ba = jnp.dot(x, params["in_ba"], preferred_element_type=jnp.float32)
        r, Dk, Dv = self.rep, self.Dk, self.Dv
        per = 2 * Dk + 2 * r * Dv
        qkvz = qkvz.reshape(T, self.Hk, per)
        q = qkvz[:, :, :Dk]
        k = qkvz[:, :, Dk:2 * Dk]
        v = qkvz[:, :, 2 * Dk:2 * Dk + r * Dv].reshape(T, self.Hv, Dv)
        z = qkvz[:, :, 2 * Dk + r * Dv:].reshape(T, self.Hv, Dv)
        ba = ba.reshape(T, self.Hk, 2 * r)
        b = ba[:, :, :r].reshape(T, self.Hv)
        a = ba[:, :, r:].reshape(T, self.Hv)
        mixed = jnp.concatenate([q.reshape(T, -1), k.reshape(T, -1),
                                 v.reshape(T, -1)], axis=-1)
        return mixed.astype(self.dtype), z, b, a

    def _split_conv(self, conv_out):
        T = conv_out.shape[0]
        q = conv_out[:, :self.key_dim].reshape(T, self.Hk, self.Dk)
        k = conv_out[:, self.key_dim:2 * self.key_dim].reshape(
            T, self.Hk, self.Dk)
        v = conv_out[:, 2 * self.key_dim:].reshape(T, self.Hv, self.Dv)
        if self.rep > 1:
            q = jnp.repeat(q, self.rep, axis=1)
            k = jnp.repeat(k, self.rep, axis=1)
        return q, k, v

    def _finish(self, params, out, z, dtype):
        T = out.shape[0]
        of = out.astype(jnp.float32)
        var = jnp.mean(of * of, axis=-1, keepdims=True)
        of = of * jax.lax.rsqrt(var + self.eps) * params["norm"]
        of = of * jax.nn.silu(z.astype(jnp.float32))
        return jnp.dot(of.reshape(T, self.value_dim).astype(self.dtype),
                       params["out"]).astype(dtype)

    # ---- forward ----------------------------------------------------------------
    def __call__(self, params: Dict, x: jax.Array, cache, meta):
        conv_pool, rec_pool = cache
        T = x.shape[0]
        mixed, z, b, a = self._project(params, x)
        g_all = (-jnp.exp(params["A_log"])[None, :]
                 * jax.nn.softplus(a + params["dt_bias"][None, :]))
        beta_all = jax.nn.sigmoid(b)

        if meta.mode == "prefill":
            slot = meta.seq_slots[0]
            fresh = meta.q_offset == 0
            hist = jnp.where(fresh, 0.0,
                             conv_pool[jnp.minimum(slot,
                                                   conv_pool.shape[0] - 1)]
                             .astype(jnp.float32)).astype(mixed.dtype)
            st = jnp.where(fresh, 0.0,
                           rec_pool[jnp.minimum(slot,
                                                rec_pool.shape[0] - 1)])
            n_valid = meta.kv_lens[0] - meta.q_offset
            valid = (jnp.arange(T) < n_valid)
            mixed = jnp.where(valid[:, None], mixed, 0.0)
            conv_out, _ = causal_conv1d_chunk(mixed, params["conv_w"], None,
                                              hist)
            conv_out = jnp.where(valid[:, None], jax.nn.silu(
                conv_out.astype(jnp.float32)), 0.0).astype(mixed.dtype)
            q, k, v = self._split_conv(conv_out)
            q = _l2norm(q)
            k = _l2norm(k)
            g = jnp.where(valid[:, None], g_all, 0.0)
            beta = jnp.where(valid[:, None], beta_all, 0.0)
            out, st = chunk_gated_delta_rule(q, k, v.astype(jnp.float32),
                                             g, beta, st)
            # conv history: last K-1 valid rows
            full = jnp.concatenate([hist, mixed], axis=0)
            idx = jnp.clip(n_valid + jnp.arange(self.K - 1), 0,
                           full.shape[0] - 1)
            conv_pool = conv_pool.at[slot].set(
                full[idx].astype(conv_pool.dtype), mode="drop")
            rec_pool = rec_pool.at[slot].set(st, mode="drop")
            return (self._finish(params, out, z, x.dtype),
                    (conv_pool, rec_pool))

        # decode: batched one-step recurrence
        slots = jnp.minimum(meta.seq_slots, conv_pool.shape[0] - 1)
        hist = conv_pool[slots].astype(mixed.dtype)    # [B, K-1, conv]
        st = rec_pool[slots]                           # [B, Hv, Dk, Dv]
        conv_out, new_hist = causal_conv1d_step(mixed, params["conv_w"],
                                                None, hist)
        conv_out = jax.nn.silu(conv_out.astype(jnp.float32)).astype(
            mixed.dtype)
        q, k, v = self._split_conv(conv_out)
        q = _l2norm(q) * self.Dk ** -0.5
        k = _l2norm(k)
        v = v.astype(jnp.float32)
        g = jnp.exp(g_all)[..., None, None]            # [B, Hv, 1, 1]
        st = st * g
        kv_mem = jnp.einsum("bhde,bhd->bhe", st, k)
        delta = (v - kv_mem) * beta_all[..., None]
        st = st + jnp.einsum("bhd,bhe->bhde", k, delta)
        out = jnp.einsum("bhde,bhd->bhe", st, q)
        wr = jnp.where(meta.seq_slots < conv_pool.shape[0], meta.seq_slots,
                       conv_pool.shape[0])
        conv_pool = conv_pool.at[wr].set(new_hist.astype(conv_pool.dtype),
                                         mode="drop")
        rec_pool = rec_pool.at[wr].set(st, mode="drop")
        return self._finish(params, out, z, x.dtype), (conv_pool, rec_pool)


class GatedAttention:
    """Qwen3-Next full attention: q projection emits per-head output gates
    (attn_out * sigmoid(gate) before o_proj), per-head q/k RMSNorm, partial
    rotary."""

    def __init__(self, cfg: ModelConfig):
        self.qh = cfg.num_heads
        self.kvh = cfg.num_kv_heads
        self.D = cfg.head_dim
        self.hidden = cfg.hidden_size
        self.eps = cfg.rms_eps
        self.dtype = cfg.dtype
        self.rope = cfg.rope
        from tensorrt_llm_tpu.attention_backend import get_attention_backend
        self.backend = get_attention_backend("auto")(
            self.qh, self.kvh, self.D, self.D ** -0.5, None, None)

    def init(self, key) -> Dict:
        ks = jax.random.split(key, 4)
        H, D = self.hidden, self.D
        std = 0.5 / H ** 0.5
        mk = lambda k, i, o: (jax.random.normal(k, (i, o), jnp.float32)
                              * std).astype(self.dtype)
        return {"q": mk(ks[0], H, 2 * self.qh * D),
                "k": mk(ks[1], H, self.kvh * D),
                "v": mk(ks[2], H, self.kvh * D),
                "o": mk(ks[3], self.qh * D, H),
                "q_norm": jnp.ones((D,), jnp.float32),
                "k_norm": jnp.ones((D,), jnp.float32)}

    def param_specs(self) -> Dict:
        return {k: P(*([None] * np.ndim(v)))
                for k, v in self.init(jax.random.PRNGKey(0)).items()}

    def load_hf(self, arr, pre: str) -> Dict:
        # Qwen3NextRMSNorm stores zero-init weights applied as (1 + w)
        return {"q": arr(pre + "q_proj.weight").T.astype(self.dtype),
                "k": arr(pre + "k_proj.weight").T.astype(self.dtype),
                "v": arr(pre + "v_proj.weight").T.astype(self.dtype),
                "o": arr(pre + "o_proj.weight").T.astype(self.dtype),
                "q_norm": arr(pre + "q_norm.weight") + 1.0,
                "k_norm": arr(pre + "k_norm.weight") + 1.0}

    def __call__(self, params, x, rope_tables, kv_cache, meta):
        T = x.shape[0]
        D, qh, kvh = self.D, self.qh, self.kvh
        qg = jnp.dot(x, params["q"]).reshape(T, qh, 2 * D)
        q, gate = qg[..., :D], qg[..., D:]
        k = jnp.dot(x, params["k"]).reshape(T, kvh, D)
        v = jnp.dot(x, params["v"]).reshape(T, kvh, D)
        q = rms_norm(q, params["q_norm"], self.eps)
        k = rms_norm(k, params["k_norm"], self.eps)
        cos_t, sin_t = rope_tables
        q, k = apply_rope(q, k, meta.positions, cos_t, sin_t)
        k_cache, v_cache = kv_cache
        out, k_cache, v_cache = self.backend(q, k, v, k_cache, v_cache, meta)
        out = (out.astype(jnp.float32)
               * jax.nn.sigmoid(gate.astype(jnp.float32)))
        y = jnp.dot(out.reshape(T, qh * D).astype(self.dtype), params["o"])
        return y.astype(x.dtype), (k_cache, v_cache)


class Qwen3NextMoE:
    """Routed MoE + sigmoid-gated shared expert (HF Qwen3NextSparseMoeBlock
    == the Qwen2-MoE block)."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.moe = MoE(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.moe_intermediate_size,
            num_experts=cfg.num_experts,
            top_k=cfg.num_experts_per_tok,
            activation="silu",
            renormalize=cfg.norm_topk_prob,
            dtype=cfg.dtype, quant=cfg.quant,
            ep_size=cfg.mapping.moe_ep_size,
            tp_size=cfg.mapping.moe_tp_size)
        self.shared = GatedMLP(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.extra.get(
                "shared_expert_intermediate_size",
                cfg.moe_intermediate_size),
            activation="silu", dtype=cfg.dtype, quant=cfg.quant)

    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {"moe": self.moe.init(k1), "shared": self.shared.init(k2),
                "shared_gate": (jax.random.normal(
                    k3, (self.cfg.hidden_size, 1), jnp.float32)
                    * 0.02).astype(self.cfg.dtype)}

    def param_specs(self) -> Dict:
        return {"moe": self.moe.param_specs(),
                "shared": self.shared.param_specs(),
                "shared_gate": P(None, None)}

    def __call__(self, params, x):
        out = self.moe(params["moe"], x).astype(jnp.float32)
        sg = jax.nn.sigmoid(jnp.dot(x.astype(jnp.float32),
                                    params["shared_gate"].astype(
                                        jnp.float32)))
        out = out + sg * self.shared(params["shared"], x).astype(jnp.float32)
        return out.astype(x.dtype)


@register_auto_model("Qwen3NextForCausalLM")
class Qwen3NextForCausalLM(NemotronHForCausalLM):
    STATE_TYPES = ("M", "L", "D")
    ATTN_TYPES = ("*", "A")

    def __init__(self, cfg: ModelConfig):
        L = cfg.num_layers
        lt = cfg.extra.get("layer_types") or cfg.layer_types or \
            ["linear_attention"] * L
        self.hf_layers = L
        cfg.extra["hybrid_override_pattern"] = "".join(
            ("AQ" if "full" in t else "DQ") for t in lt)
        cfg.num_layers = 2 * L
        cfg.layer_types = None
        super().__init__(cfg)

    def _make_component(self, t: str, idx: int):
        cfg = self.cfg
        if t == "D":
            return GatedDeltaNetMixer(cfg)
        if t == "A":
            return GatedAttention(cfg)
        if t == "Q":
            return Qwen3NextMoE(cfg)
        return super()._make_component(t, idx)

    def make_layer_caches(self, kv_manager):
        S = kv_manager.slots.max_slots
        kv_shape = (kv_manager.num_blocks, kv_manager.num_kv_heads,
                    kv_manager.block_size, kv_manager.head_dim)
        caches = []
        for t, comp in zip(self.pattern, self.components):
            if t == "D":
                caches.append((
                    jnp.zeros((S, comp.K - 1, comp.conv_dim), jnp.bfloat16),
                    jnp.zeros((S, comp.Hv, comp.Dk, comp.Dv), jnp.float32)))
            elif t == "A":
                caches.append((jnp.zeros(kv_shape, kv_manager.cfg.dtype),
                               jnp.zeros(kv_shape, kv_manager.cfg.dtype)))
            else:
                caches.append(jnp.zeros((1,), jnp.float32))
        return caches

    # ---- HF weights -------------------------------------------------------------
    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        cfg = self.cfg

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = {
            "embedding": self.embedding.from_float(
                arr("model.embed_tokens.weight")),
            # all Qwen3NextRMSNorms store zero-init weights used as (1 + w)
            "final_norm": arr("model.norm.weight") + 1.0,
            "rope": tuple(make_rope_tables(cfg.rope)),
            "layers": [],
        }
        for j in range(self.hf_layers):
            pre = f"model.layers.{j}."
            mixer_comp = self.components[2 * j]
            if isinstance(mixer_comp, GatedDeltaNetMixer):
                mixer = mixer_comp.load_hf(arr, pre + "linear_attn.")
            else:
                mixer = mixer_comp.load_hf(arr, pre + "self_attn.")
            moe_comp = self.components[2 * j + 1]
            router = arr(pre + "mlp.gate.weight").T
            stacks = {}
            for kind, proj in (("gate", "gate_proj"), ("up", "up_proj"),
                               ("down", "down_proj")):
                mats = [arr(pre + f"mlp.experts.{e}.{proj}.weight").T
                        for e in range(cfg.num_experts)]
                stacks[kind] = jnp.stack(mats)
            moe_p = {
                "moe": moe_comp.moe.from_float(
                    router, stacks["gate"], stacks["up"], stacks["down"]),
                "shared": moe_comp.shared.from_float(
                    arr(pre + "mlp.shared_expert.gate_proj.weight").T,
                    arr(pre + "mlp.shared_expert.up_proj.weight").T,
                    arr(pre + "mlp.shared_expert.down_proj.weight").T),
                "shared_gate": arr(
                    pre + "mlp.shared_expert_gate.weight").T.astype(
                        cfg.dtype),
            }
            params["layers"].append({
                "norm": arr(pre + "input_layernorm.weight") + 1.0,
                "comp": mixer})
            params["layers"].append({
                "norm": arr(pre + "post_attention_layernorm.weight") + 1.0,
                "comp": moe_p})
        if not cfg.tie_word_embeddings:
            params["lm_head"] = arr("lm_head.weight").T.astype(cfg.dtype)
        return params
