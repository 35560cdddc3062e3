"""Linear quant methods: FP8, FP8 per-token, W8A8 SmoothQuant vs float ref.

Tolerances follow the reference's weight-only test discipline
(cpp/tests/unit_tests/kernels/weightOnly/weightOnlyKernelTest.cpp:70-107):
max_diff <= max|ref| * quant_scale * margin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.layers.linear import (
    FP8LinearMethod,
    Linear,
    W8A8LinearMethod,
    make_linear_method,
)
from tensorrt_llm_tpu.quantization import QuantAlgo, QuantConfig


def _ref(x, w, bias=None):
    out = np.asarray(x, np.float32) @ np.asarray(w, np.float32)
    if bias is not None:
        out = out + np.asarray(bias, np.float32)
    return out


@pytest.mark.parametrize("method,tol_scale", [
    (FP8LinearMethod(), 1 / 16),               # e4m3: 3 mantissa bits
    (FP8LinearMethod(dynamic_act=True), 1 / 8),
    (W8A8LinearMethod(), 1 / 64),               # int8 weights + int8 acts
])
def test_method_close_to_float(method, tol_scale):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    M, K, N = 16, 256, 128
    x = jax.random.normal(k1, (M, K), jnp.bfloat16)
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.05
    bias = jax.random.normal(k3, (N,), jnp.float32)
    params = method.make_params(w, bias, jnp.bfloat16)
    out = np.asarray(method.apply(params, x), np.float32)
    ref = _ref(x, w, bias)
    max_diff = np.abs(out - ref).max()
    assert max_diff <= np.abs(ref).max() * tol_scale * 1.5, (
        max_diff, np.abs(ref).max() * tol_scale)


@pytest.mark.parametrize("algo", [QuantAlgo.FP8,
                                  QuantAlgo.FP8_PER_CHANNEL_PER_TOKEN,
                                  QuantAlgo.W8A8_SQ_PER_CHANNEL])
def test_factory_and_jit(algo):
    qc = QuantConfig(quant_algo=algo)
    lin = Linear(128, 64, True, jnp.bfloat16, make_linear_method(qc, "up_proj"))
    params = lin.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128), jnp.bfloat16)
    out = jax.jit(lambda p, x: lin(p, x, activation="silu"))(params, x)
    assert out.shape == (4, 64) and out.dtype == jnp.bfloat16
    # lm_head exclusion keeps it unquantized
    from tensorrt_llm_tpu.layers.linear import UnquantizedLinearMethod
    assert isinstance(make_linear_method(qc, "lm_head"),
                      UnquantizedLinearMethod)


def test_fp8_weight_storage_dtype():
    m = FP8LinearMethod()
    p = m.make_params(jnp.ones((64, 32), jnp.float32), None, jnp.bfloat16)
    assert p["qweight"].dtype == jnp.float8_e4m3fn
