"""Ring-overlap collective matmuls vs XLA collective + dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.parallel.collective_matmul import (
    allgather_matmul,
    matmul_reducescatter,
)


def mk_mesh(n):
    if len(jax.devices()) < n:
        pytest.skip("not enough devices")
    return jax.sharding.Mesh(np.array(jax.devices()[:n]), ("tp",))


@pytest.mark.parametrize("tp", [2, 4])
def test_allgather_matmul_matches(tp):
    mesh = mk_mesh(tp)
    T, K, N = 8 * tp, 64, 96
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N), jnp.float32)

    def f(xs, w):
        return allgather_matmul(xs, w, "tp")

    got = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("tp", None), P()),
        out_specs=P(), check_vma=False))(x, w)
    want = x @ w
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tp", [2, 4])
def test_matmul_reducescatter_matches(tp):
    mesh = mk_mesh(tp)
    T, K, N = 8, 64 * tp, 32 * tp
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(T, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N), jnp.float32)

    def f(xs, ws):
        return matmul_reducescatter(xs, ws, "tp")

    got = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
        out_specs=P(None, "tp"), check_vma=False))(x, w)
    want = x @ w
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_row_parallel_linear_equivalence():
    """matmul_reducescatter + all_gather == psum(x @ w) — the row-parallel
    Linear decomposition the reference's UserBuffers overlap targets."""
    tp = 4
    mesh = mk_mesh(tp)
    T, K, N = 8, 64 * tp, 128
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(T, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N), jnp.float32)

    def ref(xs, ws):
        return jax.lax.psum(jnp.dot(xs, ws,
                                    preferred_element_type=jnp.float32),
                            "tp")

    def ours(xs, ws):
        y = matmul_reducescatter(xs, ws, "tp")
        return jax.lax.all_gather(y, "tp", axis=1, tiled=True)

    a = jax.jit(jax.shard_map(ref, mesh=mesh,
                              in_specs=(P(None, "tp"), P("tp", None)),
                              out_specs=P(), check_vma=False))(x, w)
    b = jax.jit(jax.shard_map(ours, mesh=mesh,
                              in_specs=(P(None, "tp"), P("tp", None)),
                              out_specs=P(), check_vma=False))(x, w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
