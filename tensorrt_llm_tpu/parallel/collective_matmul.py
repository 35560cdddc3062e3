"""Manually decomposed collective matmuls (ring-overlap TP).

Counterpart of the reference's UserBuffers TP-overlap path
(`cpp/tensorrt_llm/kernels/userbuffers/`, `userbuffersTensor.cpp`): on GPUs
the reference overlaps the TP collective with the GEMM by writing GEMM
output chunks directly into registered NVLink buffers.  The TPU-idiomatic
equivalent (the "collective matmul" of the scaling playbook; also what XLA's
latency-hiding scheduler tries to derive automatically) decomposes the
matmul over the ring so per-chunk `ppermute` transfers ride ICI *while* the
MXU works on the previous chunk:

  * ``allgather_matmul``: y = all_gather(x) @ w  without materializing the
    gathered activations — each step matmuls the chunk currently held and
    forwards it to the next ring neighbor.
  * ``matmul_reducescatter``: y = reduce_scatter(x @ w) — each step computes
    the partial destined for one rank, adds the arriving partial sum, and
    forwards the accumulator.

Both are numerically identical to the XLA collective + dense matmul
(modulo f32 accumulation order) and become profitable when XLA's automatic
overlap falls short on large TP GEMMs.  The engine keeps XLA collectives as
the default; these are the measured escape hatch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _ring_perm(axis_name, shift: int = 1):
    n = jax.lax.axis_size(axis_name)
    return [(i, (i + shift) % n) for i in range(n)]


def allgather_matmul(x: jax.Array, w: jax.Array, axis_name="tp",
                     preferred_element_type=jnp.float32) -> jax.Array:
    """``all_gather(x, axis=0) @ w`` with ring overlap.

    x: [T_local, K] shard (gather dim 0); w: [K, N] (often itself a column
    shard of a larger weight).  Returns [T_local * tp, N].

    Each of the tp steps matmuls the resident chunk while `ppermute`
    forwards it around the ring — compute and ICI transfer overlap instead
    of serializing gather-then-matmul.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    T = x.shape[0]
    out = jnp.zeros((T * n, w.shape[1]), preferred_element_type)
    chunk = x
    perm = _ring_perm(axis_name)

    def body(i, carry):
        out, chunk = carry
        # the chunk we now hold originated on rank (idx - i) mod n
        src = (idx - i) % n
        part = jnp.dot(chunk, w, preferred_element_type=preferred_element_type)
        out = jax.lax.dynamic_update_slice(out, part, (src * T, 0))
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        return out, chunk

    # n-1 ring hops suffice: the final resident chunk is matmul'd outside
    # the loop (the old n-iteration loop paid one extra full-chunk ICI
    # transfer whose result was discarded)
    out, chunk = jax.lax.fori_loop(0, n - 1, body, (out, chunk))
    src = (idx - (n - 1)) % n
    part = jnp.dot(chunk, w, preferred_element_type=preferred_element_type)
    return jax.lax.dynamic_update_slice(out, part, (src * T, 0))


def matmul_reducescatter(x: jax.Array, w: jax.Array, axis_name="tp",
                         preferred_element_type=jnp.float32) -> jax.Array:
    """``reduce_scatter(x @ w, scatter_axis=-1)`` with ring overlap.

    x: [T, K_local]; w: [K_local, N] (a row shard).  Returns this rank's
    [T, N // tp] slice of the reduced product.

    Step i computes the output-column block destined for a neighbor and
    accumulates it onto the partial sum arriving from the other direction,
    so the ICI transfer of partial i-1 overlaps the MXU on partial i.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    N = w.shape[1]
    if N % n:
        # psum_scatter(tiled=True) raises on indivisible dims; silently
        # computing only the first n*(N//n) columns would be wrong
        raise ValueError(f"output dim {N} not divisible by ring size {n}")
    Nl = N // n
    perm = _ring_perm(axis_name)

    def col_block(r):
        # output block owned by rank r
        wb = jax.lax.dynamic_slice_in_dim(w, r * Nl, Nl, axis=1)
        return jnp.dot(x, wb, preferred_element_type=preferred_element_type)

    # walk the ring: start with the block for rank (idx + n - 1), pass the
    # accumulator one hop each step; after n steps rank idx holds the full
    # sum of its own block
    acc = col_block((idx + n - 1) % n)

    def body(i, acc):
        acc = jax.lax.ppermute(acc, axis_name, perm)
        return acc + col_block((idx + n - 1 - i) % n)

    return jax.lax.fori_loop(1, n, body, acc)
