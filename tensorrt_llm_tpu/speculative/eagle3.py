"""EAGLE3-style one-model speculative decoding.

Counterpart of the reference's EAGLE3 path (`_torch/speculative/eagle3.py`,
`modeling_speculative.py` Eagle heads; EAGLE-3 paper arXiv:2503.01840):
multi-level feature fusion — the target's residual stream is tapped after a
low, middle and high layer, concatenated to [3H] and fused by a linear `fc`
into the draft block's input.  Catch-up passes use the fused target features;
chain drafting feeds the draft block its own [H] hidden (fc bypassed), the
EAGLE3 chain convention.

Shares the MTP drafter machinery: the draft block keeps a single-layer paged
pool over the main sequence's block tables, and target verification makes
correctness independent of draft quality.  Pretrained EAGLE3 checkpoints
with a REDUCED draft vocabulary are supported: the draft `lm_head` scores
only the draft vocab and sampled ids translate to target ids through the
checkpoint's `d2t` offset table (reference `_torch/speculative/eagle3.py`).
"""

from __future__ import annotations

import numpy as np

from tensorrt_llm_tpu.speculative.interface import SpeculativeConfig
from tensorrt_llm_tpu.speculative.mtp import MTPDrafter


class Eagle3Drafter(MTPDrafter):
    hidden_capture = "eagle3"

    def bind(self, engine, kv):
        import jax
        import jax.numpy as jnp

        super().bind(engine, kv)
        cfg = self.model_cfg
        H = cfg.hidden_size
        self.h_dim = 3 * H
        self.params["fc"] = (jax.random.normal(
            jax.random.PRNGKey(11), (3 * H, H), jnp.float32)
            * (0.5 / (3 * H) ** 0.5)).astype(cfg.dtype)
        if self.cfg.mtp_weights is not None:
            self.load_eagle_weights(self.cfg.mtp_weights)

    def load_eagle_weights(self, get_tensor):
        """Load an EAGLE3 draft checkpoint (fc, reduced-vocab draft head
        `lm_head.weight` [draft_vocab, H], and `d2t` offset table)."""
        import jax.numpy as jnp
        cfg = self.model_cfg

        def t(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32).T

        fc = t("fc.weight")
        if fc is not None:
            self.params["fc"] = fc.astype(cfg.dtype)
        head = t("lm_head.weight")            # -> [H, draft_vocab]
        if head is not None:
            self.params["draft_head"] = head.astype(cfg.dtype)
        d2t = get_tensor("d2t")
        if d2t is not None:
            self.d2t = np.asarray(d2t).astype(np.int64)
            assert self.params.get("draft_head") is None or (
                self.params["draft_head"].shape[1] == len(self.d2t)), \
                "d2t length must match the draft head's vocab"
