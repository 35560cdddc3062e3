"""Input processing (text + multimodal prompts).

Counterpart of the reference's `tensorrt_llm/inputs/` (prompt schema,
input-processor registry, multimodal data handling): prompts are either raw
strings, token-id lists, or dicts
``{"prompt" | "prompt_token_ids", "multi_modal_data": {"image": [...]}}``.
Images may be preprocessed pixel arrays [C, S, S] or raw HWC uint8 arrays
(resized + CLIP-normalized here).
"""

from __future__ import annotations

from typing import List

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _resize_bicubic(a: np.ndarray, size: int) -> np.ndarray:
    """HWC uint8 -> [size, size, C] float32 in [0, 1], matching the HF
    image processors: PIL bicubic (antialiased) when PIL is present —
    bit-identical to what transformers' processors produce — else a
    numpy separable cubic filter with downscale antialiasing."""
    try:
        from PIL import Image
        im = Image.fromarray(a).resize((size, size), Image.BICUBIC)
        return np.asarray(im).astype(np.float32) / 255.0
    except ImportError:
        pass

    def weights(n_in, n_out):
        # Keys cubic (a=-0.5), support widened by `scale` when downscaling
        scale = max(n_in / n_out, 1.0)
        centers = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        support = 2.0 * scale
        lo = np.floor(centers - support).astype(int)
        taps = int(np.ceil(2 * support)) + 2
        idx = lo[:, None] + np.arange(taps)[None, :]
        x = np.abs((idx - centers[:, None]) / scale)
        w = np.where(x < 1, 1.5 * x**3 - 2.5 * x**2 + 1,
                     np.where(x < 2, -0.5 * x**3 + 2.5 * x**2 - 4 * x + 2,
                              0.0))
        w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-8)
        return idx.clip(0, n_in - 1), w.astype(np.float32)

    f = a.astype(np.float32) / 255.0
    yi, yw = weights(a.shape[0], size)
    f = np.einsum("ot,otwc->owc", yw, f[yi])    # rows:  [out, taps, W, C]
    xi, xw = weights(a.shape[1], size)
    f = np.einsum("ot,hotc->hoc", xw, f[:, xi])  # cols: [H, out, taps, C]
    return np.clip(f, 0.0, 1.0)


def preprocess_images(images: List, vision) -> List[np.ndarray]:
    """Normalize each image to [C, S, S] float32 pixel values for the
    vision tower. Already-preprocessed CHW float arrays pass through.
    Raw HWC uint8 images are bicubic-resized (antialiased, matching the
    HF processors' PIL path) and CLIP-normalized."""
    out = []
    S = vision.image_size
    for im in images:
        a = np.asarray(im)
        if a.ndim == 3 and a.shape[0] == vision.num_channels \
                and a.dtype != np.uint8:
            out.append(a.astype(np.float32))
            continue
        assert a.ndim == 3 and a.shape[-1] == 3, f"bad image shape {a.shape}"
        r = _resize_bicubic(a, S)
        r = (r - CLIP_MEAN) / CLIP_STD
        out.append(np.transpose(r, (2, 0, 1)))
    return out
