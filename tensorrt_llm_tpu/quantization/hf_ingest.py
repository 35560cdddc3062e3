"""Pre-quantized HF checkpoint ingestion (AWQ / GPTQ).

Counterpart of the reference's quantized-checkpoint loaders
(`tensorrt_llm/_torch/modules/linear.py:1618-1692` — `W4A16_AWQ` create/load
reads `qweight`/`qzeros`/`scales` and repacks through
`preprocess_weights_for_mixed_gemm`): real W4 deployments ship AWQ/GPTQ
checkpoints whose scales came from activation-aware search — re-quantizing
dequantized floats with min-max RTN would NOT reproduce them.  We unpack the
int32 nibble words into our signed-int4 domain exactly and carry
(q, scales, zeros) through the model's weight-fusion paths as a `QTensor`,
so the packed TPU weights dequantize to bit-identical values.

HF formats handled:
  * AWQ (autoawq `WQLinear_GEMM`): qweight int32 [K, N/8] — nibble i of each
    word holds output column `AWQ_ORDER[i]` of its 8-column block; qzeros
    int32 [K/G, N/8] same packing; scales fp16 [K/G, N]; unsigned [0,15]
    domain, dequant = (q - z) * s.
  * GPTQ (AutoGPTQ v1): qweight int32 [K/8, N] — nibble i holds weight row
    `r*8+i`, natural order; qzeros int32 [K/G, N/8] natural order storing
    z-1 (the classic GPTQ offset; `checkpoint_format=="gptq_v2"` stores z);
    scales fp16 [K/G, N]; `g_idx` must be the trivial contiguous-group
    mapping (desc_act/act-order reorders K, which would require permuting
    activations at runtime — unsupported).

Our kernel domain is signed int4 in [-8, 7] with f32 zeros in the same
signed domain (quantize.py): q_s = q_u - 8, z_s = z_u - 8, so
(q_s - z_s) * s == (q_u - z_u) * s exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

# autoawq pack order: nibble i of a 32-bit word holds column AWQ_ORDER[i]
# of the 8-column block
AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)
# inverse: output column m within its block lives in nibble AWQ_INVERSE[m]
AWQ_INVERSE = (0, 4, 1, 5, 2, 6, 3, 7)


@dataclass
class QTensor:
    """A pre-quantized linear weight in [in, out] orientation.

    q: int8 [K, N], signed values in [-8, 7]
    scales: f32 [K/G, N]
    zeros:  f32 [K/G, N] (signed domain) or None (symmetric)
    """

    q: np.ndarray
    scales: np.ndarray
    zeros: Optional[np.ndarray] = None

    @property
    def shape(self):
        return self.q.shape

    @property
    def group_size(self) -> int:
        return self.q.shape[0] // self.scales.shape[0]

    def __getitem__(self, idx) -> "QTensor":
        """Column slicing only (TP interleave in the fused-weight builders
        slices [:, a:b]); K stays whole so group structure is preserved."""
        assert isinstance(idx, tuple) and len(idx) == 2, idx
        rows, cols = idx
        assert rows == slice(None), (
            "QTensor supports column slicing only (K slicing would split "
            "scale groups)")
        return QTensor(
            self.q[:, cols], self.scales[:, cols],
            None if self.zeros is None else self.zeros[:, cols])

    def dequant(self) -> np.ndarray:
        """Exact f32 dequantization [K, N] (fallback consumers: MoE expert
        stacks, unquantized-method layers)."""
        K, N = self.q.shape
        G = self.group_size
        qg = self.q.astype(np.float32).reshape(K // G, G, N)
        if self.zeros is not None:
            qg = qg - self.zeros[:, None, :]
        return (qg * self.scales[:, None, :]).reshape(K, N)

    # float-weight API shims so untouched call sites degrade gracefully
    def astype(self, dtype):
        return self.dequant().astype(dtype)


def wcat(parts: List, axis: int = 1):
    """Concatenate weight parts along the output dim; dispatches between
    float arrays and QTensors (the fused-QKV / gate_up builders)."""
    import jax.numpy as jnp

    if any(isinstance(p, QTensor) for p in parts):
        assert all(isinstance(p, QTensor) for p in parts), (
            "cannot fuse quantized and float weights into one linear")
        assert axis == 1
        g0 = parts[0].group_size
        assert all(p.group_size == g0 for p in parts), (
            [p.group_size for p in parts])
        zeros = None
        if any(p.zeros is not None for p in parts):
            zeros = np.concatenate(
                [p.zeros if p.zeros is not None
                 else np.zeros_like(p.scales) for p in parts], axis=1)
        return QTensor(
            np.concatenate([p.q for p in parts], axis=1),
            np.concatenate([p.scales for p in parts], axis=1),
            zeros)
    return jnp.concatenate(parts, axis=axis)


def _unpack_nibbles_cols(words: np.ndarray, order) -> np.ndarray:
    """int32 [R, C/8] -> uint8 [R, C]; nibble `order[m]` of each word is
    output column m of its block."""
    shifts = 4 * np.array(order, np.uint32)
    u = words.astype(np.uint32)[:, :, None] >> shifts[None, None, :]
    return (u & 0xF).astype(np.uint8).reshape(words.shape[0], -1)


def unpack_awq(qweight: np.ndarray, qzeros: np.ndarray,
               scales: np.ndarray) -> QTensor:
    """AWQ GEMM-format tensors -> QTensor (exact)."""
    q_u = _unpack_nibbles_cols(np.asarray(qweight), AWQ_INVERSE)   # [K, N]
    z_u = _unpack_nibbles_cols(np.asarray(qzeros), AWQ_INVERSE)    # [K/G, N]
    s = np.asarray(scales).astype(np.float32)
    assert q_u.shape[1] == s.shape[1] and z_u.shape == s.shape, (
        q_u.shape, z_u.shape, s.shape)
    return QTensor((q_u.astype(np.int16) - 8).astype(np.int8), s,
                   (z_u.astype(np.float32) - 8.0))


def unpack_gptq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                g_idx: Optional[np.ndarray] = None,
                v2: bool = False) -> QTensor:
    """GPTQ tensors -> QTensor (exact).  v2: checkpoint_format=='gptq_v2'
    (zeros stored without the classic -1 offset)."""
    qw = np.asarray(qweight).astype(np.uint32)        # [K/8, N]
    shifts = 4 * np.arange(8, dtype=np.uint32)
    q_u = ((qw[:, None, :] >> shifts[None, :, None]) & 0xF).astype(
        np.uint8).reshape(-1, qw.shape[1])            # [K, N] natural rows
    z_u = _unpack_nibbles_cols(np.asarray(qzeros), range(8))  # [K/G, N]
    if not v2:
        z_u = ((z_u.astype(np.uint16) + 1) & 0xF).astype(np.uint8)
    s = np.asarray(scales).astype(np.float32)
    K, N = q_u.shape
    G = K // s.shape[0]
    if g_idx is not None:
        expect = np.arange(K, dtype=np.int64) // G
        if not np.array_equal(np.asarray(g_idx).astype(np.int64), expect):
            raise NotImplementedError(
                "GPTQ act-order (desc_act) checkpoints reorder K rows; "
                "runtime activation permutation is not supported")
    assert z_u.shape == s.shape, (z_u.shape, s.shape)
    return QTensor((q_u.astype(np.int16) - 8).astype(np.int8), s,
                   (z_u.astype(np.float32) - 8.0))


def maybe_load_quantized(get_tensor, name: str, fmt: str,
                         v2: bool = False) -> Optional[QTensor]:
    """If `name` ('...weight') belongs to a pre-quantized linear in the
    checkpoint, load and unpack it; else None (caller falls back to the
    float path).  `fmt` in {'awq', 'gptq'}."""
    if not name.endswith(".weight"):
        return None
    base = name[: -len(".weight")]
    qw = get_tensor(base + ".qweight")
    if qw is None:
        return None
    qz = get_tensor(base + ".qzeros")
    s = get_tensor(base + ".scales")
    assert qz is not None and s is not None, f"incomplete quant tensors: {base}"
    if fmt == "awq":
        return unpack_awq(qw, qz, s)
    if fmt == "gptq":
        return unpack_gptq(qw, qz, s, get_tensor(base + ".g_idx"), v2=v2)
    raise NotImplementedError(f"quant checkpoint format {fmt!r}")


def quant_config_from_hf(hf_quant_cfg) -> Optional[dict]:
    """Map an HF `quantization_config` (dict or transformers config object)
    to our QuantConfig kwargs + checkpoint format metadata.

    Reference behavior: `_torch/modules/linear.py:1618-1692` consumes these
    checkpoints directly via the quant-method plugin; we adopt the config so
    `LLM(model=awq_dir)` needs no explicit quant args.
    """
    if hf_quant_cfg is None:
        return None
    if not isinstance(hf_quant_cfg, dict):
        hf_quant_cfg = getattr(hf_quant_cfg, "to_dict", lambda: None)() or \
            dict(hf_quant_cfg.__dict__)
    method = (hf_quant_cfg.get("quant_method") or "").lower()
    bits = int(hf_quant_cfg.get("bits", 4) or 4)
    if method not in ("awq", "gptq"):
        return None
    if bits != 4:
        raise NotImplementedError(
            f"pre-quantized {method} checkpoint with bits={bits}; only 4-bit "
            "ingestion is implemented")
    if method == "awq":
        version = (hf_quant_cfg.get("version") or "gemm").lower()
        if version != "gemm":
            # unpack_awq implements only the WQLinear_GEMM nibble layout;
            # accepting "gemv" here would mis-unpack its different packing
            raise NotImplementedError(f"AWQ packing version {version!r} "
                                      "(only 'gemm' checkpoints supported)")
    group = int(hf_quant_cfg.get("group_size", 128) or 128)
    exclude = tuple(hf_quant_cfg.get("modules_to_not_convert") or ()) or None
    fmt_v2 = (hf_quant_cfg.get("checkpoint_format") == "gptq_v2")
    return {
        "algo": "W4A16_AWQ" if method == "awq" else "W4A16_GPTQ",
        "group_size": group,
        "format": method,
        "v2": fmt_v2,
        "exclude_modules": exclude,
        "desc_act": bool(hf_quant_cfg.get("desc_act", False)),
    }
