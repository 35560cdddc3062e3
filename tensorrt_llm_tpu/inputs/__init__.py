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


def preprocess_images(images: List, vision) -> List[np.ndarray]:
    """Normalize each image to [C, S, S] float32 pixel values for the
    vision tower. Already-preprocessed CHW float arrays pass through."""
    out = []
    S = vision.image_size
    for im in images:
        a = np.asarray(im)
        if a.ndim == 3 and a.shape[0] == vision.num_channels \
                and a.dtype != np.uint8:
            out.append(a.astype(np.float32))
            continue
        # HWC uint8 -> resize (nearest) -> normalize -> CHW
        assert a.ndim == 3 and a.shape[-1] == 3, f"bad image shape {a.shape}"
        h, w = a.shape[:2]
        yi = (np.arange(S) * h // S).clip(0, h - 1)
        xi = (np.arange(S) * w // S).clip(0, w - 1)
        r = a[yi][:, xi].astype(np.float32) / 255.0
        r = (r - CLIP_MEAN) / CLIP_STD
        out.append(np.transpose(r, (2, 0, 1)))
    return out
