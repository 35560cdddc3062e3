"""Runtime multi-LoRA: many adapters served concurrently.

Counterpart of the reference's multi-LoRA stack (`PeftCacheManager`, grouped
LoRA GEMM `cpp/tensorrt_llm/kernels/lora/`, `loraOp.cpp`): adapters are
stacked into per-layer device tensors (slot 0 is the zero adapter = base
model), every request carries an adapter slot, and each linear adds its
per-row low-rank side product

    y += scaling * (x @ A[slot]) @ B[slot]

computed as a masked loop over live slots (slot count is small and static,
so the extra work is L tiny rank-r matmuls — the TPU analog of the grouped
LoRA GEMM).

Fused-projection mapping: q/k/v (and gate/up) adapters concatenate along the
rank axis with their B factors scattered into the fused output's column
ranges, so one (A, B) pair per fused linear covers all sub-projections.

Under TP the stacked tensors shard like their base linears: column-parallel
B factors are column-permuted into the fused weight's per-rank interleaved
layout and shard on the output dim; row-parallel A factors shard on the
input dim and the rank-r intermediate psums over the tp axes before B.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from tensorrt_llm_tpu.lora.lora_manager import LoraAdapter, load_lora_adapter
from tensorrt_llm_tpu.utils import logger


class MultiLoraManager:
    """Builds stacked per-layer adapter tensors for a llama-family model."""

    def __init__(self, adapters: Dict[str, LoraAdapter], cfg):
        self.names = ["<base>"] + sorted(adapters)
        self.slots = {n: i for i, n in enumerate(self.names)}
        self.adapters = adapters
        self.cfg = cfg

    @classmethod
    def from_paths(cls, paths: Dict[str, str], cfg) -> "MultiLoraManager":
        adapters = {name: load_lora_adapter(p)
                    for name, p in paths.items()}
        for name, a in adapters.items():
            # runtime multi-LoRA applies additive BA deltas per batch row;
            # DoRA's row renormalization depends on the merged weight and
            # cannot ride that path — merge it at load instead
            assert not a.is_dora, (
                f"adapter {name!r} is DoRA — use lora_path= (merge at "
                "load); runtime multi-LoRA slots are additive-only")
        return cls(adapters, cfg)

    def slot_of(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        return self.slots[name]

    # ---- stacked tensors -----------------------------------------------------------
    def _fused(self, layer: int, subs: List[Tuple[str, int, int]],
               in_dim: int, out_dim: int):
        """Stack one fused linear's adapters.

        subs: [(hf_module_suffix, out_lo, out_hi)] column ranges of each
        sub-projection inside the fused output.  Returns (A [L, in, R],
        B [L, R, out]) float32 with scaling folded into B, or None if no
        adapter touches this linear.
        """
        L = len(self.names)
        per = []
        for name in self.names[1:]:
            ad = self.adapters[name]
            pairs = []
            for suffix, lo, hi in subs:
                key = f"model.layers.{layer}.{suffix}"
                if key in ad.weights:
                    A, B = ad.weights[key]  # A [r, in], B [out_sub, r]
                    pairs.append((A, B, lo, hi))
            per.append(pairs)
        if not any(per):
            return None
        r_tot = max(sum(A.shape[0] for A, _, _, _ in pairs) or 1
                    for pairs in per)
        A_st = np.zeros((L, in_dim, r_tot), np.float32)
        B_st = np.zeros((L, r_tot, out_dim), np.float32)
        for li, pairs in enumerate(per):
            off = 0
            name = self.names[li + 1]
            scaling = self.adapters[name].scaling
            for A, B, lo, hi in pairs:
                r = A.shape[0]
                A_st[li + 1, :, off:off + r] = A.T
                B_st[li + 1, off:off + r, lo:hi] = B.T * scaling
                off += r
        return A_st, B_st

    def build_layer_lora(self, layer: int) -> Dict:
        """Per-layer stacked adapters keyed by fused linear name."""
        cfg = self.cfg
        D = cfg.head_dim
        qd = cfg.num_heads * D
        kvd = cfg.num_kv_heads * D
        H, I = cfg.hidden_size, cfg.intermediate_size
        tp = cfg.mapping.tp_size
        out = {}
        v = self._fused(layer, [("self_attn.q_proj", 0, qd),
                                ("self_attn.k_proj", qd, qd + kvd),
                                ("self_attn.v_proj", qd + kvd, qd + 2 * kvd)],
                        H, qd + 2 * kvd)
        if v is not None:
            A, B = v
            if tp > 1:  # match the fused qkv weight's per-rank interleave
                B = interleave_columns(
                    B, [(0, qd), (qd, qd + kvd), (qd + kvd, qd + 2 * kvd)],
                    tp)
            out["qkv"] = (A, B)
        v = self._fused(layer, [("self_attn.o_proj", 0, H)], qd, H)
        if v is not None:
            out["o"] = v
        v = self._fused(layer, [("mlp.gate_proj", 0, I),
                                ("mlp.up_proj", I, 2 * I)], H, 2 * I)
        if v is not None:
            A, B = v
            if tp > 1:
                B = interleave_columns(B, [(0, I), (I, 2 * I)], tp)
            out["gate_up"] = (A, B)
        v = self._fused(layer, [("mlp.down_proj", 0, H)], I, H)
        if v is not None:
            out["down"] = v
        return out

    def attach(self, params: Dict, dtype) -> Dict:
        """Inject stacked adapter tensors into the model's param pytree."""
        import jax.numpy as jnp
        n = 0
        for i, lp in enumerate(params["layers"]):
            lora = self.build_layer_lora(i)
            if not lora:
                continue
            attn_lora = {k: (jnp.asarray(a).astype(dtype),
                             jnp.asarray(b).astype(dtype))
                         for k, (a, b) in lora.items() if k in ("qkv", "o")}
            mlp_lora = {k: (jnp.asarray(a).astype(dtype),
                            jnp.asarray(b).astype(dtype))
                        for k, (a, b) in lora.items()
                        if k in ("gate_up", "down")}
            if attn_lora:
                lp["attn"]["lora"] = attn_lora
            if mlp_lora:
                lp["mlp"]["lora"] = mlp_lora
            n += len(lora)
        logger.info("multi-LoRA: %d adapters (%s), %d fused linears patched",
                    len(self.names) - 1, self.names[1:], n)
        return params


def apply_lora(x, base_out, lora: Tuple, lora_ids, row_parallel=False):
    """base_out += masked per-slot low-rank products (slot 0 contributes 0).

    x [T, in], lora = (A [L, in, R], B [L, R, out]), lora_ids [T] int32.
    row_parallel: x and A are sharded on the input dim — psum the rank-r
    intermediate over the tp axes before B (mirrors the base linear's
    all-reduce)."""
    import jax.numpy as jnp
    A, B = lora
    L = A.shape[0]
    out = base_out
    for a in range(1, L):
        sel = (lora_ids == a)[:, None].astype(jnp.float32)
        h = jnp.dot(x.astype(A.dtype), A[a],
                    preferred_element_type=jnp.float32)
        if row_parallel:
            from tensorrt_llm_tpu.parallel.ops import tp_all_reduce
            h = tp_all_reduce(h)
        d = jnp.dot(h.astype(B.dtype), B[a],
                    preferred_element_type=jnp.float32)
        out = out + (sel * d).astype(out.dtype)
    return out


def interleave_columns(mat: np.ndarray, seg_bounds, tp: int) -> np.ndarray:
    """Permute the last axis from segment-major [s0 | s1 | ..] to the fused
    TP-interleaved layout [s0_r0 | s1_r0 | .. | s0_r1 | ..] used by the base
    fused weights (Attention.from_float / GatedMLP.from_float)."""
    idx = []
    for r in range(tp):
        for lo, hi in seg_bounds:
            per = (hi - lo) // tp
            idx.extend(range(lo + r * per, lo + (r + 1) * per))
    return mat[..., np.array(idx)]
