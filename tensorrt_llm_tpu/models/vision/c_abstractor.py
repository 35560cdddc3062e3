"""C-Abstractor visual projector (HyperCLOVA-X) in JAX.

Counterpart of the reference's `HCXVisionCAbstractor`
(`/root/reference/tensorrt_llm/_torch/models/modeling_hyperclovax.py:406-566`),
which builds its conv stages from `timm.models.regnet.RegStage` — timm is
not in this image, so the RegNet bottleneck stage is re-implemented from
its published structure:

    net = Sequential(s1, AdaptiveAvgPool2d(hw, hw), s2)
    s1 = RegStage(depth=3, in=encoder_hidden, out=hidden,
                  stride=1, dilation=1, act=SiLU, norm=LayerNorm2d)
    s2 = RegStage(depth=3, in=hidden, out=hidden, ...)
    readout = Linear(hidden, out) [+ SiLU + Linear(out, out)] * (mlp_depth-1)

Each RegStage block ``b{i}`` is a timm `Bottleneck` with the regnet
defaults (bottle_ratio=1, group_size=1, se_ratio=0.25, downsample only
when in != out — never here since all widths match):

    conv1: 1x1 conv -> LayerNorm2d -> SiLU
    conv2: 3x3 DEPTHWISE conv (group_size=1 => groups == channels)
           -> LayerNorm2d -> SiLU
    se:    squeeze-excite, rd_channels = round(in_chs * 0.25),
           mean-pool -> fc1 1x1 -> SiLU -> fc2 1x1 -> sigmoid gate
    conv3: 1x1 conv -> LayerNorm2d (no activation)
    out = SiLU(conv3_out + residual)

Weight names mirror the timm state dict exactly
(``net.0.b1.conv1.conv.weight``, ``...conv1.bn.weight`` — the norm is
called ``bn`` even when it is a LayerNorm) so HF checkpoints load 1:1.
All compute is NHWC; LayerNorm2d normalizes the channel axis (eps 1e-6,
timm's default).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _ln_channels(x: jax.Array, w, b, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the trailing channel axis of an NHWC tensor."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)
            * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def adaptive_avg_pool_nhwc(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch.nn.AdaptiveAvgPool2d semantics on an NHWC tensor.

    Output bin i over an input extent of size n covers
    [floor(i*n/out), ceil((i+1)*n/out)).  Shapes are static under jit.
    """
    B, H, W, C = x.shape
    rows = []
    for i in range(out_h):
        h0, h1 = (i * H) // out_h, -(-((i + 1) * H) // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * W) // out_w, -(-((j + 1) * W) // out_w)
            cols.append(x[:, h0:h1, w0:w1, :].astype(jnp.float32)
                        .mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1).astype(x.dtype)   # [B, out_h, out_w, C]


class CAbstractor:
    """pos_emb + (RegStage, adaptive pool, RegStage) + MLP readout."""

    def __init__(self, num_queries: int, num_input_tokens: int,
                 encoder_hidden_size: int, hidden_size: int,
                 output_hidden_size: int, pos_emb: bool = True,
                 prenorm: bool = False, depth: int = 3, mlp_depth: int = 2,
                 se_ratio: float = 0.25, dtype=jnp.bfloat16):
        assert int(num_queries ** 0.5) ** 2 == num_queries, \
            f"n_queries must be a square number: {num_queries}"
        self.hw = int(num_queries ** 0.5)
        self.num_queries = num_queries
        self.num_input_tokens = num_input_tokens
        self.E = encoder_hidden_size
        self.C = hidden_size
        self.O = output_hidden_size
        self.use_pos_emb = pos_emb
        self.use_prenorm = prenorm
        self.depth = depth
        self.mlp_depth = mlp_depth
        self.se_ratio = se_ratio
        self.dtype = dtype

    # ---- params ----------------------------------------------------------
    def _init_block(self, key, in_c: int, out_c: int) -> Dict:
        ks = iter(jax.random.split(key, 8))
        rd = int(round(in_c * self.se_ratio))

        def conv(i, o):
            return (jax.random.normal(next(ks), (i, o), jnp.float32)
                    * (1.0 / i ** 0.5)).astype(self.dtype)

        def ln(c):
            return {"w": jnp.ones((c,), jnp.float32),
                    "b": jnp.zeros((c,), jnp.float32)}

        return {
            "conv1": conv(in_c, out_c), "ln1": ln(out_c),
            "conv2_dw": (jax.random.normal(next(ks), (3, 3, out_c),
                                           jnp.float32) / 3.0
                         ).astype(self.dtype), "ln2": ln(out_c),
            "se_fc1": ((jax.random.normal(next(ks), (out_c, rd), jnp.float32)
                        * (1.0 / out_c ** 0.5)).astype(self.dtype),
                       jnp.zeros((rd,), jnp.float32)),
            "se_fc2": ((jax.random.normal(next(ks), (rd, out_c), jnp.float32)
                        * (1.0 / rd ** 0.5)).astype(self.dtype),
                       jnp.zeros((out_c,), jnp.float32)),
            "conv3": conv(out_c, out_c), "ln3": ln(out_c),
        }

    def init(self, key) -> Dict:
        ks = iter(jax.random.split(key, 2 * self.depth + self.mlp_depth + 2))
        p: Dict = {
            "s1": [self._init_block(next(ks), self.E if i == 0 else self.C,
                                    self.C) for i in range(self.depth)],
            "s2": [self._init_block(next(ks), self.C, self.C)
                   for _ in range(self.depth)],
            "readout": [],
        }
        if self.use_pos_emb:
            p["pos_emb"] = (jax.random.normal(
                next(ks), (self.num_input_tokens, self.E), jnp.float32)
                * 0.02)
        if self.use_prenorm:
            p["prenorm"] = {"w": jnp.ones((self.E,), jnp.float32),
                            "b": jnp.zeros((self.E,), jnp.float32)}
        i, o = self.C, self.O
        for _ in range(self.mlp_depth):
            p["readout"].append(
                ((jax.random.normal(next(ks), (i, o), jnp.float32)
                  * (0.5 / i ** 0.5)).astype(self.dtype),
                 jnp.zeros((o,), jnp.float32)))
            i = o
        return p

    def load_hf_weights(self, get_tensor, prefix: str) -> Dict:
        """Load from the HF checkpoint's timm-format names under `prefix`
        (e.g. ``mm_projector.``)."""
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        def block(stage_idx: int, b: int) -> Dict:
            pre = f"net.{stage_idx}.b{b}."
            c1 = arr(pre + "conv1.conv.weight")       # [out, in, 1, 1]
            c2 = arr(pre + "conv2.conv.weight")       # [C, 1, 3, 3] depthwise
            c3 = arr(pre + "conv3.conv.weight")
            f1 = arr(pre + "se.fc1.weight")           # [rd, C, 1, 1]
            f2 = arr(pre + "se.fc2.weight")           # [C, rd, 1, 1]
            return {
                "conv1": c1[:, :, 0, 0].T.astype(self.dtype),
                "ln1": {"w": arr(pre + "conv1.bn.weight"),
                        "b": arr(pre + "conv1.bn.bias")},
                "conv2_dw": c2[:, 0].transpose(1, 2, 0).astype(self.dtype),
                "ln2": {"w": arr(pre + "conv2.bn.weight"),
                        "b": arr(pre + "conv2.bn.bias")},
                "se_fc1": (f1[:, :, 0, 0].T.astype(self.dtype),
                           arr(pre + "se.fc1.bias")),
                "se_fc2": (f2[:, :, 0, 0].T.astype(self.dtype),
                           arr(pre + "se.fc2.bias")),
                "conv3": c3[:, :, 0, 0].T.astype(self.dtype),
                "ln3": {"w": arr(pre + "conv3.bn.weight"),
                        "b": arr(pre + "conv3.bn.bias")},
            }

        p: Dict = {
            "s1": [block(0, b + 1) for b in range(self.depth)],
            "s2": [block(2, b + 1) for b in range(self.depth)],
            "readout": [],
        }
        if self.use_pos_emb:
            p["pos_emb"] = arr("pos_emb")[0]           # [1, N, E] -> [N, E]
        if self.use_prenorm:
            p["prenorm"] = {"w": arr("prenorm.weight"),
                            "b": arr("prenorm.bias")}
        for li in range(self.mlp_depth):
            # readout indices: 0, then (SiLU at odd slots) 2, 4, ...
            w = arr(f"readout.{2 * li}.weight")
            p["readout"].append((w.T.astype(self.dtype),
                                 arr(f"readout.{2 * li}.bias")))
        return p

    # ---- forward ---------------------------------------------------------
    def _block(self, bp: Dict, x: jax.Array) -> jax.Array:
        shortcut = x
        # conv1: 1x1 -> LN -> SiLU
        h = jnp.einsum("bhwc,cd->bhwd", x, bp["conv1"].astype(x.dtype))
        h = jax.nn.silu(_ln_channels(h, bp["ln1"]["w"], bp["ln1"]["b"])
                        .astype(jnp.float32)).astype(x.dtype)
        # conv2: 3x3 depthwise (pad 1) -> LN -> SiLU
        C = h.shape[-1]
        dw = bp["conv2_dw"].astype(h.dtype)            # [3, 3, C]
        h = jax.lax.conv_general_dilated(
            h, dw[:, :, None, :],                      # HWIO [3, 3, 1, C]
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        h = jax.nn.silu(_ln_channels(h, bp["ln2"]["w"], bp["ln2"]["b"])
                        .astype(jnp.float32)).astype(x.dtype)
        # squeeze-excite
        se = h.astype(jnp.float32).mean(axis=(1, 2))   # [B, C]
        se = jax.nn.silu(se @ bp["se_fc1"][0].astype(jnp.float32)
                         + bp["se_fc1"][1])
        se = se @ bp["se_fc2"][0].astype(jnp.float32) + bp["se_fc2"][1]
        h = h * jax.nn.sigmoid(se)[:, None, None, :].astype(h.dtype)
        # conv3: 1x1 -> LN (no act), then residual + SiLU
        h = jnp.einsum("bhwc,cd->bhwd", h, bp["conv3"].astype(h.dtype))
        h = _ln_channels(h, bp["ln3"]["w"], bp["ln3"]["b"])
        return jax.nn.silu((h + shortcut).astype(jnp.float32)
                           ).astype(x.dtype)

    def __call__(self, params: Dict, x: jax.Array) -> jax.Array:
        """[B, L, E] visual features -> [B, num_queries, O]."""
        B, L, E = x.shape
        if self.use_prenorm:
            x = _ln_channels(x, params["prenorm"]["w"], params["prenorm"]["b"])
        if self.use_pos_emb:
            x = x + params["pos_emb"][None].astype(x.dtype)
        g = int(L ** 0.5)
        assert g * g == L, f"token count {L} is not square"
        h = x.reshape(B, g, g, E)
        for bp in params["s1"]:
            h = self._block(bp, h)
        h = adaptive_avg_pool_nhwc(h, self.hw, self.hw)
        for bp in params["s2"]:
            h = self._block(bp, h)
        h = h.reshape(B, self.hw * self.hw, self.C)
        for li, (w, b) in enumerate(params["readout"]):
            h = jnp.einsum("bqc,cd->bqd", h, w.astype(h.dtype)) \
                + b.astype(h.dtype)
            if li + 1 < len(params["readout"]):
                h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
        return h
