"""Rotary position embeddings.

Counterpart of the reference's RoPE handling inside attention preprocessing
(`cpp/.../common/attentionOp.cpp` QKV preprocessing; `fusedQKNormRopeKernel.cu`).
Tables are precomputed once per model; application is an elementwise op XLA
fuses into the QKV projection epilogue.

Implements the "NeoX" rotate-half convention used by Llama/Qwen/Mistral, with
linear / llama3 / yarn frequency scaling variants.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RopeConfig:
    head_dim: int = 128
    theta: float = 10000.0
    max_position: int = 8192
    scaling_type: Optional[str] = None  # None | 'linear' | 'llama3' | 'yarn'
    scaling_factor: float = 1.0
    # llama3-specific
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position: int = 8192
    # partial rotary (e.g. GPT-NeoX style models)
    rotary_dim: Optional[int] = None
    # yarn-specific (DeepSeek): NTK-by-parts ramp + attention temperature
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: Optional[float] = None
    mscale_all_dim: Optional[float] = None
    attention_factor: Optional[float] = None
    truncate: bool = True   # floor/ceil the yarn correction range (HF flag)
    # DeepSeek checkpoints store rope pairs interleaved (x0,y0,x1,y1,…);
    # apply de-interleaves before the rotate-half math
    interleaved: bool = False
    # Qwen2-VL multimodal 3D rope: frequency dims split into
    # (temporal, height, width) sections — see apply_mrope
    mrope_sections: Optional[tuple] = None
    # Qwen3-VL: T/H/W sections interleave by stride 3 instead of chunking
    mrope_interleaved: bool = False


def _base_inv_freq(cfg: RopeConfig) -> jnp.ndarray:
    dim = cfg.rotary_dim or cfg.head_dim
    return 1.0 / (cfg.theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))


def _llama3_scale(cfg: RopeConfig, inv_freq: jnp.ndarray) -> jnp.ndarray:
    low_wl = cfg.original_max_position / cfg.low_freq_factor
    high_wl = cfg.original_max_position / cfg.high_freq_factor
    wavelen = 2 * math.pi / inv_freq
    scaled = inv_freq / cfg.scaling_factor
    smooth = (cfg.original_max_position / wavelen - cfg.low_freq_factor) / (
        cfg.high_freq_factor - cfg.low_freq_factor)
    smooth = jnp.clip(smooth, 0.0, 1.0)
    mid = (1 - smooth) * scaled + smooth * inv_freq
    return jnp.where(wavelen > low_wl, scaled,
                     jnp.where(wavelen < high_wl, inv_freq, mid))


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def _yarn_inv_freq(cfg: RopeConfig) -> Tuple[jnp.ndarray, float]:
    """NTK-by-parts inverse frequencies + attention temperature (YaRN,
    arXiv:2309.00071) — matches HF `_compute_yarn_parameters` so DeepSeek
    checkpoints reproduce bit-for-bit."""
    dim = cfg.rotary_dim or cfg.head_dim
    base, factor = cfg.theta, cfg.scaling_factor
    orig_max = cfg.original_max_position

    att = cfg.attention_factor
    if att is None:
        if cfg.mscale and cfg.mscale_all_dim:
            att = float(_yarn_mscale(factor, cfg.mscale)
                        / _yarn_mscale(factor, cfg.mscale_all_dim))
        else:
            att = _yarn_mscale(factor)

    def corr_dim(num_rot):
        return (dim * math.log(orig_max / (num_rot * 2 * math.pi))) / (
            2 * math.log(base))

    low, high = corr_dim(cfg.beta_fast), corr_dim(cfg.beta_slow)
    if cfg.truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, dim - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip(
        (jnp.arange(dim // 2, dtype=jnp.float32) - low) / (high - low), 0, 1)
    extrap_factor = 1.0 - ramp
    pos_freqs = cfg.theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    inv_extrap = 1.0 / pos_freqs
    inv_interp = 1.0 / (factor * pos_freqs)
    return inv_interp * (1 - extrap_factor) + inv_extrap * extrap_factor, att


def make_rope_tables(cfg: RopeConfig) -> Tuple[jax.Array, jax.Array]:
    """Returns (cos, sin) tables of shape [max_position, rotary_dim//2], f32.

    YaRN's attention-temperature factor is folded into the tables (the HF
    convention: cos/sin scaled by `attention_scaling`)."""
    att = 1.0
    if cfg.scaling_type == "yarn":
        inv_freq, att = _yarn_inv_freq(cfg)
    else:
        inv_freq = _base_inv_freq(cfg)
        if cfg.scaling_type == "linear":
            inv_freq = inv_freq / cfg.scaling_factor
        elif cfg.scaling_type == "llama3":
            inv_freq = _llama3_scale(cfg, inv_freq)
    pos = jnp.arange(cfg.max_position, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)  # [P, D/2]
    return jnp.cos(freqs) * att, jnp.sin(freqs) * att


def apply_mrope(
    q: jax.Array,            # [T, H, D]
    k: jax.Array,            # [T, Hkv, D]
    positions3: jax.Array,   # [3, T] int32 (temporal, height, width)
    cos_table: jax.Array,    # [P, D/2]
    sin_table: jax.Array,
    sections,                # e.g. (16, 24, 24); sums to D/2
    interleaved: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Qwen2-VL multimodal 3D rotary embedding (HF
    `apply_multimodal_rotary_pos_emb`): frequency dim j uses the temporal /
    height / width position according to its section.  Text tokens carry
    identical t==h==w positions, reducing exactly to 1-D rope.
    interleaved (Qwen3-VL `apply_interleaved_mrope`): H owns channels
    1,4,..,3*sec_h-2 and W owns 2,5,..,3*sec_w-1 (stride 3); T the rest —
    preserving frequency continuity across the three axes."""
    half = cos_table.shape[-1]
    if interleaved:
        import numpy as np
        sel_np = np.zeros(half, np.int32)
        sel_np[1:3 * sections[1]:3] = 1
        sel_np[2:3 * sections[2]:3] = 2
        sel = jnp.asarray(sel_np)
    else:
        sel = jnp.repeat(jnp.arange(len(sections)),
                         jnp.asarray(sections, jnp.int32),
                         total_repeat_length=half)    # [D/2] in {0,1,2}
    cos3 = cos_table[positions3]                      # [3, T, D/2]
    sin3 = sin_table[positions3]
    onehot = jax.nn.one_hot(sel, len(sections), dtype=cos3.dtype)  # [D/2, 3]
    cos = jnp.einsum("stj,js->tj", cos3, onehot)      # [T, D/2]
    sin = jnp.einsum("stj,js->tj", sin3, onehot)
    rot = half * 2
    cos = cos[:, None, :]
    sin = sin[:, None, :]

    def rotate(x):
        dtype = x.dtype
        x1 = x[..., :half].astype(jnp.float32)
        x2 = x[..., half:rot].astype(jnp.float32)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1).astype(dtype)
        if x.shape[-1] > rot:
            out = jnp.concatenate([out, x[..., rot:]], axis=-1)
        return out

    return rotate(q), rotate(k)


def apply_rope(
    q: jax.Array,           # [T, H, D]
    k: jax.Array,           # [T, Hkv, D]
    positions: jax.Array,   # [T] int32
    cos_table: jax.Array,   # [P, D/2]
    sin_table: jax.Array,
    interleaved: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """NeoX rotate-half RoPE applied in f32.

    interleaved: input pairs are stored (x0,y0,x1,y1,…) — DeepSeek checkpoint
    layout (HF `apply_rotary_pos_emb_interleave`); de-interleave first, the
    output stays in the de-interleaved order exactly as HF's does.
    """
    rot = cos_table.shape[-1] * 2
    cos = cos_table[positions][:, None, :]  # [T, 1, D/2]
    sin = sin_table[positions][:, None, :]

    def rotate(x):
        dtype = x.dtype
        xr, xtail = x[..., :rot], x[..., rot:]
        if interleaved:
            s = xr.shape
            xr = xr.reshape(*s[:-1], rot // 2, 2)
            xr = jnp.swapaxes(xr, -1, -2).reshape(s)
        x1 = xr[..., : rot // 2].astype(jnp.float32)
        x2 = xr[..., rot // 2:].astype(jnp.float32)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1).astype(dtype)
        if xtail.shape[-1]:
            out = jnp.concatenate([out, xtail], axis=-1)
        return out

    return rotate(q), rotate(k)
