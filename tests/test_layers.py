"""Layer-level unit tests (linear methods, norms, rope, embeddings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.layers import GatedMLP, Linear, UnquantizedLinearMethod, W4A16LinearMethod, W8A16LinearMethod
from tensorrt_llm_tpu.ops.norms import add_rms_norm, rms_norm
from tensorrt_llm_tpu.ops.rope import RopeConfig, apply_rope, make_rope_tables
from tensorrt_llm_tpu.quantization import QuantAlgo, QuantConfig


def test_linear_unquantized():
    lin = Linear(256, 512, has_bias=True)
    params = lin.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.bfloat16)
    y = lin(params, x)
    assert y.shape == (4, 512)
    ref = np.asarray(x, np.float32) @ np.asarray(params["weight"], np.float32)
    ref = ref + np.asarray(params["bias"])
    np.testing.assert_allclose(np.asarray(y, np.float32), ref, atol=0.1)


@pytest.mark.parametrize("method_cls,tol", [(W4A16LinearMethod, 0.25),
                                            (W8A16LinearMethod, 0.05)])
def test_linear_quantized_close_to_float(method_cls, tol):
    K, N = 512, 512
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)
    lin = Linear(K, N, method=method_cls())
    params = lin.quantize_from_float(w)
    y = lin(params, x)
    ref = np.asarray(x, np.float32) @ np.asarray(w)
    rel = np.abs(np.asarray(y, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < tol, rel
    # vs the *dequantized* weights (i.e. kernel numerics alone) must be tight
    if method_cls is W4A16LinearMethod:
        from tensorrt_llm_tpu.quantization import dequantize_w4_any
        wdq = dequantize_w4_any(params["qweight"], params["scales"])
        ref2 = np.asarray(x, np.float32) @ np.asarray(wdq)
        rel2 = np.abs(np.asarray(y, np.float32) - ref2).max() / np.abs(ref2).max()
        assert rel2 < 0.01, rel2


def test_gated_mlp():
    mlp = GatedMLP(hidden_size=256, intermediate_size=512)
    gate = jax.random.normal(jax.random.PRNGKey(0), (256, 512), jnp.float32) * 0.05
    up = jax.random.normal(jax.random.PRNGKey(1), (256, 512), jnp.float32) * 0.05
    down = jax.random.normal(jax.random.PRNGKey(2), (512, 256), jnp.float32) * 0.05
    params = mlp.from_float(gate, up, down)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.bfloat16)
    y = mlp(params, x)
    xf = np.asarray(x, np.float32)
    g = xf @ np.asarray(gate)
    u = xf @ np.asarray(up)
    ref = (g / (1 + np.exp(-g)) * u) @ np.asarray(down)
    np.testing.assert_allclose(np.asarray(y, np.float32), ref, atol=0.15,
                               rtol=0.1)


def test_gated_mlp_w4a16_quant():
    q = QuantConfig(quant_algo=QuantAlgo.W4A16, group_size=64)
    mlp = GatedMLP(hidden_size=256, intermediate_size=512, quant=q)
    gate = jax.random.normal(jax.random.PRNGKey(0), (256, 512), jnp.float32) * 0.05
    up = jax.random.normal(jax.random.PRNGKey(1), (256, 512), jnp.float32) * 0.05
    down = jax.random.normal(jax.random.PRNGKey(2), (512, 256), jnp.float32) * 0.05
    params = mlp.from_float(gate, up, down)
    assert params["gate_up"]["qweight"].dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.bfloat16)
    y = mlp(params, x)
    xf = np.asarray(x, np.float32)
    g = xf @ np.asarray(gate)
    u = xf @ np.asarray(up)
    ref = (g / (1 + np.exp(-g)) * u) @ np.asarray(down)
    rel = np.abs(np.asarray(y, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.25, rel


def test_rms_norm_matches_numpy():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (128,), jnp.float32)
    y = rms_norm(x, w, 1e-6)
    xf = np.asarray(x)
    ref = xf / np.sqrt((xf ** 2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_add_rms_norm_residual():
    x = jnp.ones((2, 64), jnp.float32)
    r = jnp.full((2, 64), 2.0, jnp.float32)
    w = jnp.ones((64,), jnp.float32)
    y, new_r = add_rms_norm(x, r, w)
    np.testing.assert_allclose(np.asarray(new_r), 3.0)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-3)


def test_rope_rotation_preserves_norm():
    cfg = RopeConfig(head_dim=64, max_position=128)
    cos, sin = make_rope_tables(cfg)
    q = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 64), jnp.float32)
    pos = jnp.arange(8, dtype=jnp.int32)
    q2, k2 = apply_rope(q, k, pos, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q2), axis=-1),
                               np.linalg.norm(np.asarray(q), axis=-1),
                               rtol=1e-4)
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(q2[0]), np.asarray(q[0]), atol=1e-5)


def test_rope_relative_property():
    # <rope(q,i), rope(k,j)> depends only on i-j for matching vectors
    cfg = RopeConfig(head_dim=32, max_position=64)
    cos, sin = make_rope_tables(cfg)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32), jnp.float32)

    def dot_at(qi, kj):
        qq, _ = apply_rope(q, q, jnp.array([qi]), cos, sin)
        kk, _ = apply_rope(k, k, jnp.array([kj]), cos, sin)
        return float(jnp.sum(qq * kk))

    assert abs(dot_at(5, 3) - dot_at(10, 8)) < 1e-3


def test_attention_sinks_spec_matches_head_sharding():
    """Sinks pair 1:1 with query heads, which shard over the full
    ("ep","tp") attention-TP product — P("tp") alone misaligns them
    whenever moe_ep > 1."""
    from jax.sharding import PartitionSpec as P
    from tensorrt_llm_tpu.layers.attention import Attention
    from tensorrt_llm_tpu.parallel.ops import TP_AXES

    attn = Attention(hidden_size=64, num_heads=4, num_kv_heads=2,
                     head_dim=16, rope=RopeConfig(head_dim=16),
                     has_sinks=True)
    assert attn.param_specs()["sinks"] == P(TP_AXES)
