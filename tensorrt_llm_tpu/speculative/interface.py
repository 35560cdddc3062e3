"""Speculative decoding interface.

Counterpart of the reference's `_torch/speculative/interface.py`
(`SpeculativeDecodingMode` :45-56, `get_spec_drafter`): a Drafter proposes
tokens, the target engine verifies a whole draft chunk in one forward
(reusing the prefill path with per-row logits), and the executor accepts the
longest matching prefix plus one bonus token.

Round-1 modes: NGRAM (host-side matcher, reference ngram.py) and DRAFT_TARGET
(two-model, reference model_drafter.py).  EAGLE/MTP one-model fusion is a
later round (needs hidden-state taps).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, List, Optional


class SpeculativeMode(str, enum.Enum):
    NONE = "NONE"
    NGRAM = "NGRAM"
    DRAFT_TARGET = "DRAFT_TARGET"


@dataclass
class SpeculativeConfig:
    mode: SpeculativeMode = SpeculativeMode.NGRAM
    max_draft_len: int = 4
    # ngram
    max_matching_ngram_size: int = 3
    # draft-target
    draft_model: Any = None          # path | ModelConfig
    # only greedy requests use speculation (rejection sampling lands later)
    greedy_only: bool = True


class Drafter:
    """Proposes draft tokens for one request."""

    def propose(self, request) -> List[int]:
        raise NotImplementedError

    def on_accepted(self, request, accepted_tokens: List[int]):
        """Called after verification with the tokens actually accepted."""

    def on_request_finished(self, request):
        pass


def get_drafter(cfg: SpeculativeConfig, llm_args=None) -> Drafter:
    from tensorrt_llm_tpu.speculative.ngram import NGramDrafter
    from tensorrt_llm_tpu.speculative.draft_target import DraftTargetDrafter
    if cfg.mode == SpeculativeMode.NGRAM:
        return NGramDrafter(cfg)
    if cfg.mode == SpeculativeMode.DRAFT_TARGET:
        return DraftTargetDrafter(cfg, llm_args)
    raise ValueError(cfg.mode)
