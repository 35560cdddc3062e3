"""Video inputs: temporal frame sampling + EVS token pruning.

Counterpart of the reference's `tensorrt_llm/inputs/evs.py` (Efficient
Video Sampling: prune visually-static video tokens by inter-frame cosine
dissimilarity, always retaining the full first frame) and the video path of
`inputs/utils.py` (frame loading/sampling).  numpy implementations — these
run on the host during input processing, before embeddings enter the
device path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def sample_video_frames(video, num_frames: int = 8) -> List[np.ndarray]:
    """Uniform temporal sampling down to `num_frames` HWC frames.

    video: ``[T, H, W, C]`` array or a list of HWC frames. Videos shorter
    than `num_frames` keep every frame.
    """
    frames = list(video) if isinstance(video, (list, tuple)) else \
        [video[i] for i in range(video.shape[0])]
    T = len(frames)
    if T <= num_frames:
        return [np.asarray(f) for f in frames]
    idx = np.linspace(0, T - 1, num_frames).round().astype(int)
    return [np.asarray(frames[i]) for i in idx]


def compute_retained_tokens_count(video_size: Tuple[int, int, int],
                                  spatial_merge_size: int,
                                  pruning_ratio: float) -> int:
    """Tokens kept for a (T, H, W) token grid at `pruning_ratio` — never
    fewer than one full frame (reference evs.py:7)."""
    T, H, W = (int(v) for v in video_size)
    min_tokens = (H // spatial_merge_size) * (W // spatial_merge_size)
    evs_tokens = int(T * min_tokens * (1 - pruning_ratio))
    return max(min_tokens, evs_tokens)


def compute_retention_mask(video_embeds: np.ndarray,
                           video_size: Tuple[int, int, int],
                           spatial_merge_size: int,
                           pruning_ratio: float,
                           flatten_output: bool = True) -> np.ndarray:
    """EVS core (reference evs.py:33): rank merged video tokens by
    1 - cosine_similarity with the same spatial position in the previous
    frame; keep the most-changing tokens plus the entire first frame.

    video_embeds: ``[T * H' * W', hidden]`` (H' = H // merge, ...).
    Returns a boolean mask over the flattened token grid.
    """
    T, H, W = (int(v) for v in video_size)
    Hm, Wm = H // spatial_merge_size, W // spatial_merge_size
    e = np.asarray(video_embeds, np.float32).reshape(T, Hm, Wm, -1)
    a, b = e[1:], e[:-1]
    denom = (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    cos = (a * b).sum(-1) / np.maximum(denom, 1e-8)
    dissim = 1.0 - cos
    # first frame: forced-max dissimilarity => always retained
    dissim = np.concatenate(
        [np.full((1, Hm, Wm), 255.0, np.float32), dissim], axis=0)
    flat = dissim.reshape(-1)
    order = np.argsort(-flat, kind="stable")
    keep = compute_retained_tokens_count((T, H, W), spatial_merge_size,
                                         pruning_ratio)
    mask = np.zeros(flat.shape[0], bool)
    mask[order[:keep]] = True
    return mask if flatten_output else mask.reshape(T, Hm, Wm)


def prune_video_embeddings(video_embeds: np.ndarray,
                           video_size: Tuple[int, int, int],
                           spatial_merge_size: int,
                           pruning_ratio: float,
                           positions: Optional[np.ndarray] = None):
    """Apply the EVS retention mask: returns (kept_embeds, kept_indices) —
    the indices let callers drop the matching placeholder tokens."""
    mask = compute_retention_mask(video_embeds, video_size,
                                  spatial_merge_size, pruning_ratio)
    idx = np.nonzero(mask)[0]
    return np.asarray(video_embeds)[idx], idx
