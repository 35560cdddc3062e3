"""Gated MLP (SwiGLU / GeGLU) block.

Counterpart of the reference's `_torch/modules/gated_mlp.py`: gate+up are a
single fused column-parallel projection (one weight-streaming pass over HBM —
same motivation as the reference's fused gate_up loading,
modules/linear.py:1593), the activation*gate product is elementwise, and down
is row-parallel with the all-reduce after.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.layers.linear import Linear, LinearMethodBase, make_linear_method
from tensorrt_llm_tpu.ops.w4a16_gemm import _ACTIVATIONS
from tensorrt_llm_tpu.quantization import QuantConfig


@dataclass
class GatedMLP:
    hidden_size: int
    intermediate_size: int
    activation: str = "silu"
    has_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quant: Optional[QuantConfig] = None
    tp_size: int = 1

    def __post_init__(self):
        method = lambda: make_linear_method(self.quant, "mlp")
        self.gate_up = Linear(
            self.hidden_size, 2 * self.intermediate_size, self.has_bias,
            self.dtype, method(), tp_mode="column", tp_size=self.tp_size)
        self.down = Linear(
            self.intermediate_size, self.hidden_size, self.has_bias,
            self.dtype, method(), tp_mode="row", tp_size=self.tp_size)

    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        std = 0.5 / (self.hidden_size ** 0.5)
        gate = jax.random.normal(k1, (self.hidden_size, self.intermediate_size),
                                 jnp.float32) * std
        up = jax.random.normal(k2, (self.hidden_size, self.intermediate_size),
                               jnp.float32) * std
        down = jax.random.normal(k3, (self.intermediate_size, self.hidden_size),
                                 jnp.float32) * (0.5 / self.intermediate_size ** 0.5)
        return self.from_float(gate, up, down)

    def from_float(self, gate_w, up_w, down_w, gate_b=None, up_b=None,
                   down_b=None) -> Dict:
        """Build params from full float weights ([in, out] layout).

        gate and up are interleaved per TP shard so a column-sharded fused
        weight keeps gate/up halves aligned within each shard.
        """
        tp = self.tp_size
        I = self.intermediate_size
        per = I // tp
        cols = []
        for r in range(tp):
            cols.append(gate_w[:, r * per:(r + 1) * per])
            cols.append(up_w[:, r * per:(r + 1) * per])
        from tensorrt_llm_tpu.quantization.hf_ingest import wcat
        fused_w = wcat(cols, axis=1)
        fused_b = None
        if gate_b is not None:
            bcols = []
            for r in range(tp):
                bcols.append(gate_b[r * per:(r + 1) * per])
                bcols.append(up_b[r * per:(r + 1) * per])
            fused_b = jnp.concatenate(bcols)
        return {
            "gate_up": self.gate_up.quantize_from_float(fused_w, fused_b),
            "down": self.down.quantize_from_float(down_w, down_b),
        }

    def param_specs(self) -> Dict:
        from tensorrt_llm_tpu.parallel.ops import TP_AXES
        return {"gate_up": self.gate_up.param_specs(),
                "down": self.down.param_specs(),
                # runtime multi-LoRA stacks (pruned when absent)
                "lora": {"gate_up": (P(None, None, None),
                                     P(None, None, TP_AXES)),
                         "down": (P(None, TP_AXES, None),
                                  P(None, None, None))}}

    def __call__(self, params: Dict, x: jax.Array,
                 lora_ids=None) -> jax.Array:
        gu = self.gate_up(params["gate_up"], x)
        lora = params.get("lora")
        if lora and "gate_up" in lora and lora_ids is not None:
            from tensorrt_llm_tpu.lora.multi_lora import apply_lora
            gu = apply_lora(x, gu, lora["gate_up"], lora_ids)
        local_i = self.intermediate_size // self.tp_size
        gate, up = gu[..., :local_i], gu[..., local_i:]
        h = (_ACTIVATIONS[self.activation](gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(x.dtype)
        y = self.down(params["down"], h)
        if lora and "down" in lora and lora_ids is not None:
            from tensorrt_llm_tpu.lora.multi_lora import apply_lora
            y = apply_lora(h, y, lora["down"], lora_ids,
                           row_parallel=self.tp_size > 1)
        return y


@dataclass
class MLP:
    """Non-gated MLP: up -> activation -> down (Starcoder2 c_fc/c_proj,
    Nemotron relu^2 — reference `_torch/modules/mlp.py`)."""

    hidden_size: int
    intermediate_size: int
    activation: str = "gelu"
    has_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quant: Optional[QuantConfig] = None
    tp_size: int = 1

    def __post_init__(self):
        method = lambda: make_linear_method(self.quant, "mlp")
        self.up = Linear(self.hidden_size, self.intermediate_size,
                         self.has_bias, self.dtype, method(),
                         tp_mode="column", tp_size=self.tp_size)
        self.down = Linear(self.intermediate_size, self.hidden_size,
                           self.has_bias, self.dtype, method(),
                           tp_mode="row", tp_size=self.tp_size)

    def init(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        std = 0.5 / (self.hidden_size ** 0.5)
        up = jax.random.normal(k1, (self.hidden_size, self.intermediate_size),
                               jnp.float32) * std
        down = jax.random.normal(k2, (self.intermediate_size, self.hidden_size),
                                 jnp.float32) * (0.5 / self.intermediate_size ** 0.5)
        zb = ((jnp.zeros((self.intermediate_size,), jnp.float32),
               jnp.zeros((self.hidden_size,), jnp.float32))
              if self.has_bias else (None, None))
        return self.from_float(up, down, up_b=zb[0], down_b=zb[1])

    def from_float(self, up_w, down_w, up_b=None, down_b=None,
                   act=None) -> Dict:
        p = {"up": self.up.quantize_from_float(up_w, up_b),
             "down": self.down.quantize_from_float(down_w, down_b)}
        if self.activation == "xielu":
            # learned xIELU (Apertus, arXiv:2411.13010): softplus-
            # parameterized positive/negative slopes, defaults 0.8 / 0.3+beta
            import numpy as np
            p["act"] = act if act is not None else {
                "alpha_p": jnp.full((1,), float(np.log(np.expm1(0.8))),
                                    jnp.float32),
                "alpha_n": jnp.full((1,), float(np.log(np.expm1(0.3))),
                                    jnp.float32)}
        return p

    def param_specs(self) -> Dict:
        p = {"up": self.up.param_specs(),
             "down": self.down.param_specs()}
        if self.activation == "xielu":
            p["act"] = {"alpha_p": P(), "alpha_n": P()}
        return p

    def __call__(self, params: Dict, x: jax.Array,
                 lora_ids=None) -> jax.Array:
        h = self.up(params["up"], x)
        if self.activation == "xielu":
            h = _xielu(h.astype(jnp.float32), params["act"]).astype(x.dtype)
        else:
            h = _ACTIVATIONS[self.activation](
                h.astype(jnp.float32)).astype(x.dtype)
        return self.down(params["down"], h)


def _xielu(x, act, beta: float = 0.5, eps: float = -1e-6):
    """xIELU (reference transformers XIELUActivation._xielu_python):
    alpha_p x^2 + beta x for x>0; (expm1(min(x, eps)) - x) alpha_n + beta x
    for x<=0, with softplus-parameterized learned alphas."""
    alpha_p = jax.nn.softplus(act["alpha_p"].astype(jnp.float32))
    alpha_n = beta + jax.nn.softplus(act["alpha_n"].astype(jnp.float32))
    return jnp.where(
        x > 0,
        alpha_p * x * x + beta * x,
        (jnp.expm1(jnp.minimum(x, eps)) - x) * alpha_n + beta * x)
