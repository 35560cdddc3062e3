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
    MTP = "MTP"                      # one-model, hidden-state tap
    EAGLE3 = "EAGLE3"                # one-model, multi-level feature fusion
    MEDUSA = "MEDUSA"                # K independent draft heads
    USER_PROVIDED = "USER_PROVIDED"  # user callable proposes drafts
    AUTO = "AUTO"                    # heuristic pick (reference auto_heuristic)
    SAVE_HIDDEN_STATES = "SAVE_HIDDEN_STATES"  # capture hiddens to disk


@dataclass
class SpeculativeConfig:
    mode: SpeculativeMode = SpeculativeMode.NGRAM
    max_draft_len: int = 4
    # ngram
    max_matching_ngram_size: int = 3
    # draft-target
    draft_model: Any = None          # path | ModelConfig
    # MTP: weight source (get_tensor callable or None => random init / load
    # from the main checkpoint's extra layer)
    mtp_weights: Any = None
    # user-provided: callable(request) -> List[int]
    proposer: Any = None
    # user-provided TREE: callable(request) -> (tokens, parents) with
    # parents[i] in {-1 (root attach), 0..i-1}
    tree_proposer: Any = None
    # draft-tree branching per level (reference EAGLE tree configs), e.g.
    # (3, 2, 1): 3 root candidates, 2 children each, 1 grandchild each.
    # None => linear chain drafting.
    tree_branches: Optional[tuple] = None
    # Medusa (reference MedusaDecodingConfig): number of draft heads
    # (0 => max_draft_len) and the candidate tree as per-depth rank paths
    # (e.g. [(0,), (0, 0), (1,), (0, 1)])
    num_medusa_heads: int = 0
    medusa_choices: Optional[list] = None
    # only greedy requests use speculation (rejection sampling lands later)
    greedy_only: bool = True
    # disable speculation when more than this many requests are decoding in
    # one step (large batches amortize decode cost already — reference
    # NGramDecodingConfig.max_concurrency); None = always on
    max_concurrency: Optional[int] = None
    # Draft length by decode batch size (reference draft_len_schedule,
    # llm_args.py:676): {batch_size_threshold: draft_len}; the largest
    # threshold <= the current batch size wins.  None = max_draft_len.
    draft_len_schedule: Optional[dict] = None
    # Adaptive disable (reference acceptance_window /
    # acceptance_length_threshold): once the rolling average accepted
    # length over the last `acceptance_window` rounds drops below the
    # threshold, speculation turns off for the rest of the run.
    acceptance_window: Optional[int] = None
    acceptance_length_threshold: Optional[float] = None
    # Relaxed acceptance for thinking models (reference MTPDecodingConfig
    # use_relaxed_acceptance_for_thinking / relaxed_topk / relaxed_delta,
    # mtp.py:798-845 + mtp_relaxed_acceptance_op): inside a
    # <think>...</think> span, a draft token is accepted when it lands in
    # the target's top-`relaxed_topk` AND its probability is within
    # `relaxed_delta` of the top-1 probability — trading exact greedy
    # parity for acceptance rate while the model free-form reasons.
    use_relaxed_acceptance_for_thinking: bool = False
    relaxed_topk: int = 1
    relaxed_delta: float = 0.0
    begin_thinking_phase_token: Optional[int] = None
    end_thinking_phase_token: Optional[int] = None
    # SAVE_HIDDEN_STATES: output dir / shard prefix / records per shard /
    # capture width ("final" | "eagle3")
    save_dir: Optional[str] = None
    save_file_prefix: str = "data"
    save_write_interval: int = 16
    save_capture: str = "final"


def suggest_spec_config(max_batch_size: int) -> SpeculativeConfig:
    """Draft-model-free default for mode=AUTO (reference
    `_torch/speculative/auto_heuristic.py:1` suggest_spec_config): NGram
    speculation, deeper drafts at small batch, disabled past 32 concurrent
    decodes."""
    return SpeculativeConfig(
        mode=SpeculativeMode.NGRAM,
        max_draft_len=5 if max_batch_size <= 4 else 3,
        max_matching_ngram_size=3 if max_batch_size <= 4 else 5,
        max_concurrency=32,
    )


class Drafter:
    """Proposes draft tokens for one request."""

    # one-model drafters tap the target's hidden states; the executor then
    # runs hidden-returning step functions and feeds on_hidden
    needs_hidden = False

    def bind(self, engine, kv):
        """Called once by the executor with the target engine + KV manager."""

    def propose(self, request) -> List[int]:
        raise NotImplementedError

    def propose_tree(self, request):
        """Optionally propose a draft TREE: (tokens, parents) with
        parents[i] in {-1, 0..i-1}.  None => use linear propose()."""
        return None

    def on_hidden(self, request, start_pos: int, hiddens):
        """Target hidden states for positions start_pos..start_pos+len-1."""

    def on_accepted(self, request, accepted_tokens: List[int]):
        """Called after verification with the tokens actually accepted."""

    def on_request_finished(self, request):
        pass


class UserProvidedDrafter(Drafter):
    """Reference SpeculativeDecodingMode.USER_PROVIDED: an arbitrary host
    callable proposes draft tokens (linear) and/or trees."""

    def __init__(self, cfg: SpeculativeConfig):
        assert callable(cfg.proposer) or callable(cfg.tree_proposer), \
            "USER_PROVIDED needs cfg.proposer or cfg.tree_proposer"
        self.cfg = cfg

    def propose(self, request) -> List[int]:
        if self.cfg.proposer is None:
            return []
        return list(self.cfg.proposer(request))[: self.cfg.max_draft_len]

    def propose_tree(self, request):
        if self.cfg.tree_proposer is None:
            return None
        out = self.cfg.tree_proposer(request)
        if out is None:
            return None
        tokens, parents = out
        return list(tokens), list(parents)


def get_drafter(cfg: SpeculativeConfig, llm_args=None) -> Drafter:
    from tensorrt_llm_tpu.speculative.ngram import NGramDrafter
    from tensorrt_llm_tpu.speculative.draft_target import DraftTargetDrafter
    from tensorrt_llm_tpu.speculative.mtp import MTPDrafter
    if isinstance(cfg, str):
        # LLM(speculative_config="AUTO") / mode-name shorthand
        cfg = SpeculativeConfig(mode=SpeculativeMode(cfg.upper()))
    if cfg.mode == SpeculativeMode.AUTO:
        mbs = getattr(llm_args, "max_batch_size", 8) if llm_args else 8
        cfg = suggest_spec_config(mbs)
    if cfg.mode == SpeculativeMode.NGRAM:
        return NGramDrafter(cfg)
    if cfg.mode == SpeculativeMode.DRAFT_TARGET:
        return DraftTargetDrafter(cfg, llm_args)
    if cfg.mode == SpeculativeMode.MTP:
        return MTPDrafter(cfg, llm_args)
    if cfg.mode == SpeculativeMode.EAGLE3:
        from tensorrt_llm_tpu.speculative.eagle3 import Eagle3Drafter
        return Eagle3Drafter(cfg, llm_args)
    if cfg.mode == SpeculativeMode.MEDUSA:
        from tensorrt_llm_tpu.speculative.medusa import MedusaDrafter
        return MedusaDrafter(cfg, llm_args)
    if cfg.mode == SpeculativeMode.USER_PROVIDED:
        return UserProvidedDrafter(cfg)
    if cfg.mode == SpeculativeMode.SAVE_HIDDEN_STATES:
        from tensorrt_llm_tpu.speculative.save_hidden import (
            SaveHiddenStatesDrafter)
        return SaveHiddenStatesDrafter(cfg)
    raise ValueError(cfg.mode)
