"""Mixture-of-Experts layer.

TPU-native counterpart of the reference's fused-MoE stack
(`_torch/modules/fused_moe/` — `CutlassFusedMoE` fused_moe_cutlass.py:30,
routing routing.py, grouped GEMM `cutlass_kernels/moe_gemm/`): instead of a
CUTLASS grouped GEMM + permute/expand/finalize CUDA kernels, tokens are sorted
by expert on-device and the expert FFNs run as two `jax.lax.ragged_dot` calls
(XLA's grouped-GEMM primitive, which tiles ragged groups onto the MXU), with
the scatter-add finalize fused by XLA.

Parallel factorization mirrors the reference's TPxEP (mapping.py:79-122) as
mesh structure (parallel/mapping.py):
  * experts sharded over the "ep" axis — each rank computes only tokens
    routed to its local experts (others contribute zero),
  * each expert's intermediate dim sharded over "tp",
  * one all-reduce over ("ep","tp") combines both (shared with the dense
    residual stream's reduction — same placement as the reference's
    MoE AllReduce fusion).

Routing variants cover Mixtral (softmax->topk->renorm), Qwen3-MoE
(norm_topk_prob), DeepSeek-style sigmoid scoring; optional shared expert.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.layers.mlp import GatedMLP
from tensorrt_llm_tpu.ops.w4a16_gemm import _ACTIVATIONS
from tensorrt_llm_tpu.parallel.ops import TP_AXES, tp_all_reduce
from tensorrt_llm_tpu.quantization import QuantConfig


@dataclass
class MoE:
    hidden_size: int
    intermediate_size: int          # per expert
    num_experts: int
    top_k: int
    activation: str = "silu"
    score_func: str = "softmax"     # softmax | sigmoid
    renormalize: bool = True        # renormalize top-k weights to sum 1
    n_shared_experts: int = 0       # DeepSeek/Qwen2-MoE style dense branch
    # DeepSeek V3 noaux-tc routing (HF DeepseekV3TopkRouter): sigmoid scores
    # + e_score_correction_bias for *selection only*, group-limited top-k
    # (n_group groups, best topk_group kept by top-2 sums), weights taken
    # from the raw sigmoid scores then renormalized and scaled
    has_score_bias: bool = False
    n_group: int = 1
    topk_group: int = 1
    routed_scaling: float = 1.0
    # GPT-OSS: router linear bias; topk-then-softmax routing; per-expert
    # biases on gate_up/down; clamped swiglu (alpha=1.702, limit=7)
    has_router_bias: bool = False
    topk_then_softmax: bool = False
    # Llama4 (HF Llama4Router/Llama4TextMoe): topk on raw logits, sigmoid
    # weights (no renorm), router weight multiplied into the expert INPUT
    topk_then_sigmoid: bool = False
    apply_weight_on_input: bool = False
    has_expert_bias: bool = False
    # EP dispatch capacity factor (reference DeepEP low-latency capacity):
    # per-rank expert rows capped at ceil(factor * T*k / ep_size); None =
    # exact dropless dispatch
    capacity_factor: Optional[float] = None
    # Wide-EP hot-expert replication (reference moeLoadBalancer redundant
    # slots): extra weight slots the balancer fills with copies of hot
    # experts; tokens split across a logical expert's replicas
    redundant_experts: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    quant: Optional[QuantConfig] = None   # expert weights stay bf16 round-1
    ep_size: int = 1
    tp_size: int = 1                # per-expert intermediate sharding
    # mesh axes that partition TOKENS (attention-dp replicas, cp sequence
    # shards): expert-load counters psum over them so the replicated-over-dp
    # counter leaf stays consistent and counts all tokens, not one shard's
    count_psum_axes: tuple = ()

    def __post_init__(self):
        self.num_slots = self.num_experts + self.redundant_experts
        assert self.num_slots % self.ep_size == 0
        assert self.intermediate_size % self.tp_size == 0
        self.experts_local = self.num_slots // self.ep_size
        self.inter_local = self.intermediate_size // self.tp_size
        # Quantized experts (reference: mixed-input grouped MoE GEMMs,
        # cutlass_kernels/moe_gemm/moe_gemm_kernels_bf16_uint4.cu) — int4
        # weights with per-group scales fed to the grouped Pallas kernel.
        q = self.quant
        self.quant_experts = bool(q is not None and q.is_weight_only_w4)
        if self.quant_experts:
            gs = q.group_size
            H, I2 = self.hidden_size, 2 * self.intermediate_size
            # gate_up: K=H (replicated), N=2I (tp column tiles)
            self._g_up = gs if 0 < gs < H and H % gs == 0 else -1
            # down: K=I (tp-sharded) — groups must not straddle tp shards
            self._g_down = (gs if 0 < gs < self.inter_local
                            and self.inter_local % gs == 0 else -1)
            if (H % 2 or self.intermediate_size % 2
                    or I2 % self.tp_size):
                self.quant_experts = False  # unpackable shape: bf16 experts
        if self.n_shared_experts:
            self.shared = GatedMLP(
                self.hidden_size,
                self.n_shared_experts * self.intermediate_size,
                self.activation, dtype=self.dtype, quant=self.quant,
                tp_size=self.ep_size * self.tp_size)

    # ---- params ------------------------------------------------------------------
    def init(self, key) -> Dict:
        keys = jax.random.split(key, 5)
        E, H, I = self.num_experts, self.hidden_size, self.intermediate_size
        std = 0.5 / (H ** 0.5)
        p = self.from_float(
            jax.random.normal(keys[0], (H, E), jnp.float32) * std,
            jax.random.normal(keys[1], (E, H, I), jnp.float32) * std,
            jax.random.normal(keys[2], (E, H, I), jnp.float32) * std,
            jax.random.normal(keys[3], (E, I, H), jnp.float32) * (0.5 / I ** 0.5),
        )
        if self.n_shared_experts:
            p["shared"] = self.shared.init(keys[4])
        return p

    def from_float(self, router_w, gate_w, up_w, down_w, shared=None,
                   score_bias=None, router_bias=None, gate_b=None, up_b=None,
                   down_b=None) -> Dict:
        """router_w [H, E]; gate/up [E, H, I]; down [E, I, H] (full float).

        gate/up are interleaved per tp shard (like GatedMLP.from_float) so the
        "tp"-sharded fused dim keeps [gate_r | up_r] aligned within each rank.
        """
        per = self.inter_local
        cols = []
        for r in range(self.tp_size):
            cols.append(gate_w[:, :, r * per:(r + 1) * per])
            cols.append(up_w[:, :, r * per:(r + 1) * per])
        fused = jnp.concatenate(cols, axis=2)
        if self.redundant_experts:
            # extra slots start as copies of experts 0..R-1 (the balancer
            # re-fills them with the actually-hot experts at runtime)
            extra = jnp.arange(self.redundant_experts) % self.num_experts
            fused = jnp.concatenate([fused, fused[extra]], axis=0)
            down_w = jnp.concatenate([down_w, down_w[extra]], axis=0)
            if gate_b is not None:
                gate_b = jnp.concatenate([gate_b, gate_b[extra]], axis=0)
                up_b = jnp.concatenate([up_b, up_b[extra]], axis=0)
            if down_b is not None:
                down_b = jnp.concatenate([down_b, down_b[extra]], axis=0)
        p = {"router": router_w.astype(jnp.float32)}
        if self.quant_experts:
            from tensorrt_llm_tpu.ops.moe_w4a16 import quantize_experts_w4
            sym = not self.quant.has_zero_point
            pk, sc, zr, _ = quantize_experts_w4(
                fused.astype(jnp.float32), self._g_up, sym,
                shards=self.tp_size)
            p["w_gate_up"], p["w_gate_up_s"] = pk, sc
            if zr is not None:
                p["w_gate_up_z"] = zr
            pk, sc, zr, _ = quantize_experts_w4(
                down_w.astype(jnp.float32),
                self._g_down if self._g_down > 0 else -1, sym, shards=1)
            p["w_down"], p["w_down_s"] = pk, sc
            if zr is not None:
                p["w_down_z"] = zr
        else:
            p["w_gate_up"] = fused.astype(self.dtype)
            p["w_down"] = down_w.astype(self.dtype)
        if self.has_router_bias:
            p["router_bias"] = (jnp.zeros((self.num_experts,), jnp.float32)
                                if router_bias is None
                                else router_bias.astype(jnp.float32))
        if self.has_expert_bias:
            E = self.num_slots
            if gate_b is None:
                gate_b = jnp.zeros((E, self.intermediate_size), jnp.float32)
                up_b = jnp.zeros((E, self.intermediate_size), jnp.float32)
            if down_b is None:
                down_b = jnp.zeros((E, self.hidden_size), jnp.float32)
            bcols = []
            for r in range(self.tp_size):
                bcols.append(gate_b[:, r * per:(r + 1) * per])
                bcols.append(up_b[:, r * per:(r + 1) * per])
            p["b_gate_up"] = jnp.concatenate(bcols, axis=1).astype(jnp.float32)
            p["b_down"] = down_b.astype(jnp.float32)
        if self.has_score_bias:
            p["score_bias"] = (jnp.zeros((self.num_experts,), jnp.float32)
                               if score_bias is None
                               else score_bias.astype(jnp.float32))
        if shared is not None:
            p["shared"] = shared
        return p

    def param_specs(self) -> Dict:
        specs = {
            "router": P(None, None),
        }
        if self.quant_experts:
            # packed tiles: [E, n_n, K//2, BN] — tp shards the column tiles
            # of gate_up and the K (=I) rows of down (pairs stay intact)
            specs["w_gate_up"] = P("ep", "tp", None, None)
            specs["w_gate_up_s"] = P("ep", None, "tp")
            specs["w_down"] = P("ep", None, "tp", None)
            specs["w_down_s"] = (P("ep", "tp", None) if self._g_down > 0
                                 else P("ep", None, None))
            if self.quant.has_zero_point:
                specs["w_gate_up_z"] = specs["w_gate_up_s"]
                specs["w_down_z"] = specs["w_down_s"]
        else:
            # interleave-free: gate|up concat is per-expert along dim 2; tp
            # shards the I halves jointly via the fused layout below
            specs["w_gate_up"] = P("ep", None, "tp")
            specs["w_down"] = P("ep", "tp", None)
        if self.has_router_bias:
            specs["router_bias"] = P(None)
        if self.has_expert_bias:
            specs["b_gate_up"] = P("ep", "tp")
            specs["b_down"] = P("ep", None)
        if self.has_score_bias:
            specs["score_bias"] = P(None)
        # load-balancer placement map (installed at runtime; pruned if absent)
        specs["expert_map"] = P(None)
        if self.n_shared_experts:
            specs["shared"] = self.shared.param_specs()
        return specs

    # ---- routing -------------------------------------------------------------------
    def route(self, params, x) -> tuple:
        """Returns (topk_ids [T,k] int32, topk_weights [T,k] f32)."""
        logits = jnp.dot(x.astype(jnp.float32), params["router"],
                         preferred_element_type=jnp.float32)  # [T, E]
        if self.has_router_bias:
            logits = logits + params["router_bias"][None, :]
        if self.topk_then_softmax:
            # GPT-OSS router: top-k on raw logits, softmax over the k values
            vals, ids = jax.lax.top_k(logits, self.top_k)
            w = jax.nn.softmax(vals, axis=-1)
            return ids.astype(jnp.int32), w
        if self.topk_then_sigmoid:
            # Llama4 router: top-k on raw logits, sigmoid weights (== HF's
            # scatter(-inf) + full sigmoid), no renormalization
            vals, ids = jax.lax.top_k(logits, self.top_k)
            return ids.astype(jnp.int32), jax.nn.sigmoid(vals)
        if self.score_func == "softmax":
            scores = jax.nn.softmax(logits, axis=-1)
        else:
            scores = jax.nn.sigmoid(logits)
        if self.has_score_bias or self.n_group > 1:
            return self._route_noaux_tc(params, scores)
        w, ids = jax.lax.top_k(scores, self.top_k)  # [T, k]
        if self.renormalize:
            w = w / jnp.sum(w, axis=-1, keepdims=True)
        return ids.astype(jnp.int32), w * self.routed_scaling

    def _route_noaux_tc(self, params, scores):
        """DeepSeek V3 routing (HF DeepseekV3TopkRouter.get_topk_indices):
        selection uses bias-corrected scores with group limits; weights use
        the raw scores."""
        T, E = scores.shape
        g, per_g = self.n_group, E // self.n_group
        choice = scores + params.get("score_bias", jnp.zeros((E,)))[None, :]
        if g > 1:
            grouped = choice.reshape(T, g, per_g)
            top2, _ = jax.lax.top_k(grouped, min(2, per_g))
            group_scores = jnp.sum(top2, axis=-1)                  # [T, g]
            _, gidx = jax.lax.top_k(group_scores, self.topk_group)
            gmask = jnp.zeros((T, g), bool).at[
                jnp.arange(T)[:, None], gidx].set(True)
            # HF zero-fills masked groups (not -inf); match it exactly
            choice = jnp.where(
                jnp.repeat(gmask, per_g, axis=-1), choice, 0.0)
        _, ids = jax.lax.top_k(choice, self.top_k)                 # [T, k]
        w = jnp.take_along_axis(scores, ids, axis=-1)
        if self.renormalize:
            w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
        return ids.astype(jnp.int32), w * self.routed_scaling

    # ---- forward --------------------------------------------------------------------
    def __call__(self, params: Dict, x: jax.Array,
                 lora_ids=None, counts=None):  # lora on experts: later round
        """counts: optional [E_local] int32 accumulator of tokens routed to
        each local expert SLOT (the Wide-EP load-balancer statistic —
        reference moeLoadBalance kernels); returned updated when given."""
        T, H = x.shape
        k = self.top_k
        El = self.experts_local
        ids, weights = self.route(params, x)             # [T, k] logical

        # Wide-EP placement: logical expert -> physical slot map installed
        # by the load balancer; [2, E] rows are (primary, replica) slots —
        # tokens split across a hot expert's replicas by pair parity
        emap = params.get("expert_map")
        if emap is not None and emap.ndim == 2:
            # (token + choice-rank) parity: flat-index parity degenerates to
            # choice-rank parity for even top_k (t*k+j ≡ j mod 2), sending a
            # hot expert's whole load to one replica whenever it is favored
            # at a fixed rank position
            par = (jnp.arange(T, dtype=jnp.int32)[:, None]
                   + jnp.arange(k, dtype=jnp.int32)[None, :]) % 2
            ids = jnp.where(par == 0, emap[0][ids], emap[1][ids])
        elif emap is not None:
            ids = emap[ids]

        flat_ids = ids.reshape(-1)                       # [T*k]
        flat_w = weights.reshape(-1)
        token_idx = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)

        if self.ep_size > 1:
            ep_rank = jax.lax.axis_index("ep")
            local = flat_ids - ep_rank * El
            valid = (local >= 0) & (local < El)
            # remote-expert pairs sort AFTER every local group and are
            # excluded from group_sizes: the grouped GEMMs never touch them
            # (the local analog of the reference's EP all-to-all dispatch —
            # each rank computes only its received rows)
            local = jnp.where(valid, local, El)
        else:
            local = flat_ids
            valid = jnp.ones_like(flat_ids, dtype=bool)

        # sort (token, k) pairs by local expert — the reference's
        # permute/sort kernels (moe_kernels.cu) as one argsort
        order = jnp.argsort(local)
        sorted_local = jnp.minimum(local[order], El - 1)  # clamp for gathers
        vsort = valid[order]
        sorted_tok = token_idx[order]
        sorted_w = flat_w[order] * vsort.astype(jnp.float32)

        group_sizes = jnp.bincount(local, length=El + 1)[:El]
        load = group_sizes  # per-slot demand (pre-capacity) for the balancer

        # static PER-EXPERT capacity (reference DeepEP low-latency capacity
        # semantics): each expert keeps its first Ce rows (earliest tokens),
        # overflow rows are dropped; None = exact/dropless.  A flat tail
        # truncation would instead drop everything routed to high-index
        # slots, starving those experts entirely under load.
        if self.capacity_factor and self.ep_size > 1:
            import math
            Ce = max(1, math.ceil(
                self.capacity_factor * T * k / self.num_slots))
            C = min(T * k, El * Ce)
        else:
            Ce, C = T * k, T * k
        if C < T * k or Ce < T * k:
            starts = jnp.cumsum(group_sizes) - group_sizes
            pos = (jnp.arange(T * k, dtype=jnp.int32)
                   - starts[sorted_local].astype(jnp.int32))
            keep = vsort & (pos < Ce)
            # compact: kept rows stay grouped by expert (stable sort keeps
            # token order within a group), dropped rows fall off the tail
            order2 = jnp.argsort(
                jnp.where(keep, sorted_local, El), stable=True)
            sorted_local = jnp.minimum(sorted_local[order2][:C], El - 1)
            sorted_tok = sorted_tok[order2][:C]
            sorted_w = (sorted_w * keep.astype(jnp.float32))[order2][:C]
            vsort = keep[order2][:C]
            group_sizes = jnp.minimum(group_sizes, Ce)

        xs = x[sorted_tok].astype(self.dtype)            # [<=T*k, H]
        if self.apply_weight_on_input:
            # Llama4: routing weight scales the expert INPUT (nonlinear, so
            # not equivalent to output scaling); finalize weight becomes 1
            xs = (xs.astype(jnp.float32)
                  * sorted_w[:, None]).astype(self.dtype)
            sorted_w = vsort.astype(jnp.float32)
        if self.quant_experts:
            from tensorrt_llm_tpu.ops.moe_w4a16 import w4a16_grouped_matmul
            h = w4a16_grouped_matmul(
                xs, params["w_gate_up"], params["w_gate_up_s"], group_sizes,
                params.get("w_gate_up_z")).astype(self.dtype)
        else:
            h = jax.lax.ragged_dot(xs, params["w_gate_up"], group_sizes)
        Il = self.inter_local
        if self.has_expert_bias:
            h = (h.astype(jnp.float32)
                 + params["b_gate_up"][sorted_local]).astype(h.dtype)
        gate, up = h[:, :Il], h[:, Il:]
        if self.activation == "swiglu_oai":
            # GPT-OSS clamped swiglu: (up+1) * gate*sigmoid(alpha*gate)
            g = jnp.minimum(gate.astype(jnp.float32), 7.0)
            u = jnp.clip(up.astype(jnp.float32), -7.0, 7.0)
            h = ((u + 1.0) * g * jax.nn.sigmoid(1.702 * g)).astype(self.dtype)
        else:
            h = (_ACTIVATIONS[self.activation](gate.astype(jnp.float32))
                 * up.astype(jnp.float32)).astype(self.dtype)
        if self.quant_experts:
            from tensorrt_llm_tpu.ops.moe_w4a16 import w4a16_grouped_matmul
            out_sorted = w4a16_grouped_matmul(
                h, params["w_down"], params["w_down_s"], group_sizes,
                params.get("w_down_z"))
        else:
            out_sorted = jax.lax.ragged_dot(h, params["w_down"], group_sizes)
        out_sorted = out_sorted.astype(jnp.float32)
        if self.has_expert_bias:
            # the reference adds the down bias once per (token, expert) pair
            # before the routing weight, matching HF GptOssExperts; under tp
            # sharding the bias is added on every shard then divided by the
            # reduction width at finalize (psum restores it once)
            b = params["b_down"][sorted_local]
            if self.tp_size > 1:
                b = b / self.tp_size
            out_sorted = out_sorted + b

        out = jnp.zeros((T, H), jnp.float32)
        # rows past the covered groups carry uninitialized kernel output;
        # where() (not *0) keeps any NaN garbage out of the scatter
        contrib = jnp.where(vsort[:, None], out_sorted * sorted_w[:, None],
                            0.0)
        out = out.at[sorted_tok].add(contrib)

        out = tp_all_reduce(out, enabled=self.ep_size * self.tp_size > 1)
        if self.n_shared_experts:
            out = out + self.shared(params["shared"], x).astype(jnp.float32)
        if counts is not None:
            upd = load.astype(counts.dtype)
            if self.count_psum_axes:
                upd = jax.lax.psum(upd, self.count_psum_axes)
            return out.astype(x.dtype), counts + upd
        return out.astype(x.dtype)
