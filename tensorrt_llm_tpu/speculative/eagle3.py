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
from tensorrt_llm_tpu.utils import logger


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
        """Load an EAGLE3 draft checkpoint: fc, reduced-vocab draft head
        `lm_head.weight` [draft_vocab, H], the `d2t` offset table, AND the
        draft decoder layer + norms (EAGLE3 exports name the single layer
        `midlayer.*`, some exports `model.layers.0.*` / `layers.0.*`) —
        loading only fc/head left the whole draft block random-initialized
        and acceptance near 1/vocab."""
        import jax.numpy as jnp
        cfg = self.model_cfg

        def t(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32).T

        def vec(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

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
        # the draft decoder layer itself
        pre = next((p for p in ("midlayer.", "model.layers.0.", "layers.0.")
                    if get_tensor(p + "input_layernorm.weight") is not None),
                   None)
        if pre is None:
            if fc is not None or head is not None:
                logger.warning(
                    "EAGLE3 checkpoint has no draft decoder layer under "
                    "midlayer./model.layers.0./layers.0. — the draft block "
                    "stays random-initialized (acceptance will be poor)")
            return
        from tensorrt_llm_tpu.models import get_model_class
        loader = get_model_class(cfg.architecture)(cfg)
        layer = {
            "input_norm": vec(pre + "input_layernorm.weight"),
            "post_attn_norm": vec(pre + "post_attention_layernorm.weight"),
            "attn": loader._load_attn(
                self.layer, pre,
                lambda n: t(n), lambda n: vec(n)),
            "mlp": loader._load_mlp(
                self.layer, lambda n: get_tensor(n), pre,
                t=lambda n: t(n)),
        }
        if any(v is None for v in (layer["input_norm"],
                                   layer["post_attn_norm"])):
            raise ValueError(f"partial EAGLE3 layer under {pre!r}: missing "
                             "input/post-attention layernorm weights")
        self.params["layer"] = layer
        # EAGLE3 names: hidden_norm ~ hnorm; the embedding-side norm may be
        # absent (identity) in trained exports
        hn = vec(pre + "hidden_norm.weight")
        if hn is None:
            hn = vec("hidden_norm.weight")
        if hn is not None:
            self.params["hnorm"] = hn
        en = vec(pre + "input_norm.weight")
        if en is None:
            en = vec("enorm.weight")
        if en is not None:
            self.params["enorm"] = en
        fn = vec("norm.weight")
        if fn is not None:
            self.params["final_norm"] = fn
