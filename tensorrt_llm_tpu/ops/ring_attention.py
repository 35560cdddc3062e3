"""Ring attention over the "cp" mesh axis (blockwise, online softmax).

The reference declares ring context-parallelism but ships no PyTorch-backend
decoder implementation (SURVEY.md §5: `CpType.RING` exists at mapping.py:31,
only a legacy TRT-plugin QKV re-layout) — this is a TPU-native upgrade: ICI
is a torus, so rotating KV blocks between neighbors (`lax.ppermute`) overlaps
transfer with each step's block attention, and the quadratic score/context
work scales 1/cp per chip without Ulysses' head-count divisibility limits
(ring works for any head count, including MQA).

Math: classic blockwise attention with online softmax (m = running max,
l = running denominator), causal masking by *global* token positions so
arbitrary sequence shards compose exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def ring_attention(
    q: jax.Array,       # [Tl, Hq, D] local queries (rope applied)
    k: jax.Array,       # [Tl, Hkv, D] local keys
    v: jax.Array,       # [Tl, Hkv, D] local values
    pos_q: jax.Array,   # [Tl] global positions of local queries
    pos_k: jax.Array,   # [Tl] global positions of local keys
    scale: float,
    axis_name: str = "cp",
    valid_q: Optional[jax.Array] = None,   # [Tl] bool (padding rows)
) -> jax.Array:
    """Causal attention where KV shards rotate around the ring. [Tl, Hq, D]."""
    cp = jax.lax.axis_size(axis_name)
    Tl, Hq, D = q.shape
    Hkv = k.shape[1]
    n_rep = Hq // Hkv

    qf = (q.astype(jnp.float32) * scale).reshape(Tl, Hkv, n_rep, D)
    perm = [(i, (i + 1) % cp) for i in range(cp)]

    def block(qf, k_c, v_c, pos_c):
        scores = jnp.einsum("thgd,shd->hgts", qf, k_c.astype(jnp.float32))
        mask = pos_c[None, :] <= pos_q[:, None]           # causal (global)
        scores = jnp.where(mask[None, None], scores, NEG_INF)
        return scores

    def step(carry, _):
        k_c, v_c, pos_c, m, l, acc = carry
        scores = block(qf, k_c, v_c, pos_c)               # [Hkv, g, Tl, S]
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        # guard fully-masked rows (exp(NEG_INF - NEG_INF) would be 1)
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(scores - safe_m[..., None])
        p = jnp.where(scores == NEG_INF, 0.0, p)
        corr = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - safe_m))
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "hgts,shd->hgtd", p, v_c.astype(jnp.float32))
        # rotate the KV shard to the next neighbor over ICI
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        pos_c = jax.lax.ppermute(pos_c, axis_name, perm)
        return (k_c, v_c, pos_c, m_new, l, acc), None

    m0 = jnp.full((Hkv, n_rep, Tl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hkv, n_rep, Tl), jnp.float32)
    acc0 = jnp.zeros((Hkv, n_rep, Tl, D), jnp.float32)
    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, pos_k, m0, l0, acc0), None, length=cp)

    out = acc / jnp.maximum(l[..., None], 1e-20)
    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(Tl, Hq, D)
    if valid_q is not None:
        out = jnp.where(valid_q[:, None, None], out, 0.0)
    return out.astype(q.dtype)
