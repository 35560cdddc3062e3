"""Linear layer with pluggable quantization methods.

TPU-native re-design of the reference's `tensorrt_llm/_torch/modules/linear.py`
(`LinearMethodBase` plugin pattern; `W4A16_AWQ_LinearMethod` create/apply at
linear.py:1618-1692): each method owns its parameter layout, offline packing,
and the fused compute path.  Weights are stored ``[in_features, out_features]``
(K-major for the GEMM reduction; HF checkpoints are transposed at load).

Tensor parallelism: the layer is *local-shape* code executed under shard_map.
``tp_mode='column'`` shards out_features (no comm); ``tp_mode='row'`` shards
in_features and all-reduces the partial outputs over the "tp" axis, applying
bias/activation after the reduction (matching the reference's row-parallel
Linear + AllReduce placement, modules/linear.py + distributed/ops.py:636).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.ops.w4a16_gemm import _ACTIVATIONS, w4a16_matmul
from tensorrt_llm_tpu.parallel.ops import TP_AXES, tp_all_reduce
from tensorrt_llm_tpu.quantization import (
    QuantAlgo, QuantConfig, choose_block_n, pack_group_for, pack_w4,
    pack_w4_tiled, quantize_w4, quantize_w8)

Params = Dict[str, jax.Array]


class LinearMethodBase:
    """Owns parameter layout + compute for one quantization scheme."""

    # TP shards along the dimension this layer's weights split over —
    # set by Linear so packers can pick shard-divisible tile widths
    tp_shards: int = 1

    def make_params(self, w: jax.Array, bias: Optional[jax.Array],
                    dtype) -> Params:
        raise NotImplementedError

    def apply(self, params: Params, x: jax.Array,
              activation: Optional[str] = None) -> jax.Array:
        raise NotImplementedError

    def param_specs(self, tp_mode: str) -> Dict[str, P]:
        raise NotImplementedError

    @staticmethod
    def _bias_spec(tp_mode: str) -> P:
        return P(TP_AXES) if tp_mode == "column" else P(None)


class UnquantizedLinearMethod(LinearMethodBase):
    def make_params(self, w, bias, dtype):
        p = {"weight": w.astype(dtype)}
        if bias is not None:
            p["bias"] = bias.astype(jnp.float32)
        return p

    def apply(self, params, x, activation=None):
        out = jnp.dot(x, params["weight"].astype(x.dtype),
                      preferred_element_type=jnp.float32)
        if "bias" in params:
            out = out + params["bias"]
        return _ACTIVATIONS[activation](out).astype(x.dtype)

    def param_specs(self, tp_mode):
        wspec = {"column": P(None, TP_AXES), "row": P(TP_AXES, None)}.get(tp_mode, P(None, None))
        return {"weight": wspec, "bias": self._bias_spec(tp_mode)}


class W4A16LinearMethod(LinearMethodBase):
    """Per-group int4 weights; fused dequant GEMM via the Pallas kernel."""

    def __init__(self, group_size: int = 128, has_zeros: bool = False,
                 clip_search: bool = False):
        self.group_size = group_size
        self.has_zeros = has_zeros
        # calibrated quantization: per-group clip-ratio search minimizing
        # reconstruction error (quantization/calibrate.py — the built-in
        # analog of the reference's ModelOpt calibration flow)
        self.clip_search = clip_search

    def _pack(self, q, n_scale_groups):
        """Tiled row-interleaved packing (TPU fast path: contiguous block
        DMA + Mosaic int4 upcast) when the shape allows, else legacy."""
        K, N = q.shape
        bn = choose_block_n(N, max(self.tp_shards, 1))
        if bn and K % 2 == 0:
            return pack_w4_tiled(q, bn)
        return pack_w4(q, pack_group_for(K, n_scale_groups))

    def make_params(self, w, bias, dtype):
        if self.clip_search:
            from tensorrt_llm_tpu.quantization.calibrate import (
                quantize_w4_calibrated)
            q, scales, zeros = quantize_w4_calibrated(
                w, self.group_size, symmetric=not self.has_zeros)
        else:
            q, scales, zeros = quantize_w4(
                w, self.group_size, symmetric=not self.has_zeros)
        p = {"qweight": self._pack(q, scales.shape[0]),
             "scales": scales}
        if zeros is not None:
            p["zeros"] = zeros
        if bias is not None:
            p["bias"] = bias.astype(jnp.float32)
        return p

    def from_quantized(self, q: jax.Array, scales: jax.Array,
                       zeros: Optional[jax.Array],
                       bias: Optional[jax.Array]) -> Params:
        """Build params from an externally-quantized (AWQ/GPTQ) checkpoint."""
        p = {"qweight": self._pack(q, scales.shape[0]),
             "scales": scales.astype(jnp.float32)}
        if zeros is not None:
            p["zeros"] = zeros.astype(jnp.float32)
        if bias is not None:
            p["bias"] = bias.astype(jnp.float32)
        return p

    def apply(self, params, x, activation=None):
        return w4a16_matmul(
            x,
            params["qweight"],
            params["scales"],
            zeros=params.get("zeros"),
            bias=params.get("bias"),
            activation=activation,
            out_dtype=x.dtype,
        )

    def param_specs(self, tp_mode):
        # Must mirror _pack's tiled-vs-legacy decision. tiled qweight is
        # [N//BN, K//2, BN] (output-column tiles on dim 0); legacy is
        # [K//2, N].
        K, N = self.kn
        tiled = bool(choose_block_n(N, max(self.tp_shards, 1))) and K % 2 == 0
        if tp_mode == "column":
            w, s = ((P(TP_AXES, None, None) if tiled else P(None, TP_AXES)),
                    P(None, TP_AXES))
        elif tp_mode == "row":
            w, s = ((P(None, TP_AXES, None) if tiled else P(TP_AXES, None)),
                    P(TP_AXES, None))
        else:
            w = P(None, None, None) if tiled else P(None, None)
            s = P(None, None)
        return {"qweight": w, "scales": s, "zeros": s,
                "bias": self._bias_spec(tp_mode)}


class W4A8LinearMethod(W4A16LinearMethod):
    """int4 per-group weights + dynamic per-token INT8 activations
    (reference `W4A8_AWQ` method, modules/linear.py; its fp8-activation
    tensor-core path maps to the TPU's 2x-rate int8xint8 MXU).  Same
    packing/params/sharding as W4A16 — only apply() differs."""

    def apply(self, params, x, activation=None):
        from tensorrt_llm_tpu.ops.w4a16_gemm import w4a8_matmul
        return w4a8_matmul(
            x,
            params["qweight"],
            params["scales"],
            zeros=params.get("zeros"),
            bias=params.get("bias"),
            activation=activation,
            out_dtype=x.dtype,
        )


class W8A16LinearMethod(LinearMethodBase):
    """Per-channel int8 weights; XLA int8->bf16 upcast matmul with
    scale-on-accumulator (XLA fuses the upcast into the matmul feed)."""

    def make_params(self, w, bias, dtype):
        q, scales = quantize_w8(w)
        p = {"qweight": q, "scales": scales}
        if bias is not None:
            p["bias"] = bias.astype(jnp.float32)
        return p

    def apply(self, params, x, activation=None):
        out = jnp.dot(x, params["qweight"].astype(x.dtype),
                      preferred_element_type=jnp.float32)
        out = out * params["scales"][None, :]
        if "bias" in params:
            out = out + params["bias"]
        return _ACTIVATIONS[activation](out).astype(x.dtype)

    def param_specs(self, tp_mode):
        if tp_mode == "column":
            w, s = P(None, TP_AXES), P(TP_AXES)
        elif tp_mode == "row":
            w, s = P(TP_AXES, None), P(None)
        else:
            w, s = P(None, None), P(None)
        return {"qweight": w, "scales": s, "bias": self._bias_spec(tp_mode)}


class FP8LinearMethod(LinearMethodBase):
    """FP8 (e4m3) weights with a per-channel dequant scale (reference
    `FP8_LinearMethod`, modules/linear.py).  Storage is fp8 — halving weight
    HBM traffic, the bandwidth-bound decode win — while compute upcasts to
    bf16 for the MXU.  ``dynamic_act=True`` additionally models
    FP8_PER_CHANNEL_PER_TOKEN: activations are faithfully quantized to e4m3
    per token before the matmul (reference `cudaScaledMM`)."""

    E4M3_MAX = 448.0

    def __init__(self, dynamic_act: bool = False):
        self.dynamic_act = dynamic_act

    def make_params(self, w, bias, dtype):
        absmax = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12)
        scales = (absmax / self.E4M3_MAX).astype(jnp.float32)
        q = (w / scales[None, :]).astype(jnp.float8_e4m3fn)
        p = {"qweight": q, "scales": scales}
        if bias is not None:
            p["bias"] = bias.astype(jnp.float32)
        return p

    def apply(self, params, x, activation=None):
        if self.dynamic_act:
            amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)),
                                       axis=-1, keepdims=True), 1e-12)
            s_act = amax / self.E4M3_MAX
            x = (x.astype(jnp.float32) / s_act).astype(jnp.float8_e4m3fn)
            out = jnp.dot(x.astype(jnp.bfloat16),
                          params["qweight"].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            out = out * s_act
        else:
            out = jnp.dot(x, params["qweight"].astype(x.dtype),
                          preferred_element_type=jnp.float32)
        out = out * params["scales"][None, :]
        if "bias" in params:
            out = out + params["bias"]
        return _ACTIVATIONS[activation](out).astype(
            x.dtype if x.dtype != jnp.float8_e4m3fn else jnp.bfloat16)

    def param_specs(self, tp_mode):
        if tp_mode == "column":
            w, s = P(None, TP_AXES), P(TP_AXES)
        elif tp_mode == "row":
            w, s = P(TP_AXES, None), P(None)
        else:
            w, s = P(None, None), P(None)
        return {"qweight": w, "scales": s, "bias": self._bias_spec(tp_mode)}


class W8A8LinearMethod(LinearMethodBase):
    """SmoothQuant-style W8A8: per-channel int8 weights, dynamic per-token
    int8 activations, int8xint8->int32 matmul on the MXU (reference
    `int8 SmoothQuant GEMM`, cutlass_kernels/int8_gemm)."""

    def make_params(self, w, bias, dtype):
        q, scales = quantize_w8(w)
        p = {"qweight": q, "scales": scales}
        if bias is not None:
            p["bias"] = bias.astype(jnp.float32)
        return p

    def apply(self, params, x, activation=None):
        xf = x.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
        s_act = amax / 127.0
        xq = jnp.clip(jnp.round(xf / s_act), -127, 127).astype(jnp.int8)
        acc = jnp.dot(xq, params["qweight"],
                      preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * s_act * params["scales"][None, :]
        if "bias" in params:
            out = out + params["bias"]
        return _ACTIVATIONS[activation](out).astype(x.dtype)

    def param_specs(self, tp_mode):
        if tp_mode == "column":
            w, s = P(None, TP_AXES), P(TP_AXES)
        elif tp_mode == "row":
            w, s = P(TP_AXES, None), P(None)
        else:
            w, s = P(None, None), P(None)
        return {"qweight": w, "scales": s, "bias": self._bias_spec(tp_mode)}


def make_linear_method(quant: Optional[QuantConfig],
                       layer_name: str = "") -> LinearMethodBase:
    """Factory mirroring the reference's quant-method selection
    (modules/linear.py `get_quant_method`)."""
    if quant is None or quant.quant_algo == QuantAlgo.NO_QUANT or quant.excludes(layer_name):
        return UnquantizedLinearMethod()
    if quant.is_weight_only_w4:
        has_zeros = quant.has_zero_point or quant.quant_algo in (
            QuantAlgo.W4A16_AWQ, QuantAlgo.W4A16_GPTQ)
        return W4A16LinearMethod(quant.group_size, has_zeros,
                                 clip_search=getattr(quant, "clip_search",
                                                     False))
    if quant.quant_algo == QuantAlgo.W4A8_AWQ:
        return W4A8LinearMethod(quant.group_size, has_zeros=True,
                                clip_search=getattr(quant, "clip_search",
                                                    False))
    if quant.quant_algo == QuantAlgo.W8A16:
        return W8A16LinearMethod()
    if quant.quant_algo == QuantAlgo.FP8:
        return FP8LinearMethod()
    if quant.quant_algo == QuantAlgo.FP8_PER_CHANNEL_PER_TOKEN:
        return FP8LinearMethod(dynamic_act=True)
    if quant.quant_algo == QuantAlgo.W8A8_SQ_PER_CHANNEL:
        return W8A8LinearMethod()
    raise NotImplementedError(f"quant algo {quant.quant_algo} not yet supported")


@dataclass
class Linear:
    """Config-only module; parameters live in an external pytree."""

    in_features: int
    out_features: int
    has_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    method: LinearMethodBase = None
    tp_mode: str = "none"   # none | column | row
    tp_size: int = 1

    def __post_init__(self):
        if self.method is None:
            self.method = UnquantizedLinearMethod()
        if self.tp_mode == "column":
            assert self.out_features % self.tp_size == 0
        elif self.tp_mode == "row":
            assert self.in_features % self.tp_size == 0
        # packers pick shard-divisible tile widths from this
        self.method.tp_shards = self.tp_size if self.tp_mode != "none" else 1
        self.method.kn = (self.in_features, self.out_features)

    # ---- parameter creation -------------------------------------------------
    def init(self, key) -> Params:
        """Random init (tests). Always GLOBAL shapes — under TP the engine
        shards params into equal contiguous chunks along the tp dim."""
        w = jax.random.normal(key, (self.in_features, self.out_features),
                              jnp.float32)
        w = w * (0.5 / jnp.sqrt(self.in_features))
        bias = (jnp.zeros((self.out_features,), jnp.float32)
                if self.has_bias else None)
        return self.method.make_params(w, bias, self.dtype)

    def quantize_from_float(self, w,
                            bias: Optional[jax.Array] = None) -> Params:
        """Pack *full* (unsharded) weights [in, out].  `w` is float OR a
        pre-quantized QTensor from an AWQ/GPTQ checkpoint — the latter is
        packed exactly, never re-quantized (reference linear.py:1618-1692)."""
        assert w.shape == (self.in_features, self.out_features), (
            w.shape, (self.in_features, self.out_features))
        from tensorrt_llm_tpu.quantization.hf_ingest import QTensor
        if isinstance(w, QTensor):
            if isinstance(self.method, W4A16LinearMethod):
                if self.method.group_size != w.group_size:
                    self.method.group_size = w.group_size
                return self.method.from_quantized(
                    jnp.asarray(w.q), jnp.asarray(w.scales),
                    None if w.zeros is None else jnp.asarray(w.zeros), bias)
            # excluded/other-method layer in a quantized checkpoint:
            # exact dequantization, then that method's own packing
            w = jnp.asarray(w.dequant())
        return self.method.make_params(w, bias, self.dtype)

    def param_specs(self) -> Dict[str, P]:
        return self.method.param_specs(self.tp_mode)

    # ---- forward -------------------------------------------------------------
    def __call__(self, params: Params, x: jax.Array,
                 activation: Optional[str] = None,
                 reduce_output: bool = True) -> jax.Array:
        if self.tp_mode == "row" and self.tp_size > 1:
            # bias/act must come after the cross-shard reduction
            bias = params.get("bias")
            pp = {k: v for k, v in params.items() if k != "bias"}
            out = self.method.apply(pp, x, activation=None)
            if reduce_output:
                out = tp_all_reduce(out)
            if bias is not None:
                out = out + bias
            if activation:
                out = _ACTIVATIONS[activation](out.astype(jnp.float32)).astype(out.dtype)
            return out
        return self.method.apply(params, x, activation=activation)
