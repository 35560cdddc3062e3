"""Sampling parameters.

Mirrors the reference's `tensorrt_llm/sampling_params.py` /
`executor::SamplingConfig` (`cpp/include/.../executor/executor.h:64`) with the
fields the TPU sampler implements; unsupported knobs raise early rather than
silently degrade.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union


@dataclass
class SamplingParams:
    max_tokens: int = 32
    temperature: float = 1.0
    top_k: int = 0               # 0 => disabled (full softmax)
    top_p: float = 1.0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: Optional[int] = None
    stop: Union[str, List[str], None] = None
    stop_token_ids: Optional[List[int]] = None
    include_stop_str_in_output: bool = False
    ignore_eos: bool = False
    logprobs: Optional[int] = None      # top-N logprobs per generated token
    prompt_logprobs: Optional[int] = None  # top-N logprobs per PROMPT token
    # full-logits returns (reference SamplingParams return_context_logits /
    # return_generation_logits): [prompt_len, V] rows captured during
    # prefill / one [V] row per generated token.  Opt-in — forces the
    # host-logits single-step path and disables prefix reuse for the
    # request (cached positions would have no logits).
    return_context_logits: bool = False
    return_generation_logits: bool = False
    n: int = 1
    best_of: Optional[int] = None
    use_beam_search: bool = False
    # beam score = cum_logp / out_len**length_penalty (0 => raw sum, the
    # reference SamplingConfig lengthPenalty default)
    length_penalty: float = 0.0
    # Variable-Beam-Width-Search (reference beam_width_array): per-step
    # beam widths; the last entry holds for all later steps
    beam_width_array: Optional[List[int]] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    # guided decoding (grammar-constrained sampling)
    guided_decoding: Optional["GuidedDecodingParams"] = None
    end_id: Optional[int] = None        # overrides tokenizer eos
    # logit controls (reference sampling_params.py: bad_words,
    # embedding_bias, no_repeat_ngram_size, min_tokens, logits_processor)
    min_tokens: int = 0                 # suppress eos/stop ids before this
    bad_words: Optional[List[List[int]]] = None   # banned token phrases
    logit_bias: Optional[dict] = None   # token id -> additive bias
    no_repeat_ngram_size: Optional[int] = None
    logits_processor: Optional[object] = None  # f(token_ids, logits)->logits

    def __post_init__(self):
        assert self.max_tokens >= 1
        assert self.temperature >= 0.0
        assert 0.0 < self.top_p <= 1.0
        if self.top_k > 64:
            # the on-device sampler buckets top-k at 64 for static shapes;
            # silently clamping would change the distribution — raise early
            raise ValueError(f"top_k={self.top_k} exceeds the supported "
                             "maximum of 64")
        if self.use_beam_search:
            if (self.best_of or self.n) < 2:
                raise ValueError("beam search needs n/best_of >= 2")
            if self.guided_decoding is not None:
                raise ValueError("beam search + guided decoding unsupported")
        if isinstance(self.stop, str):
            self.stop = [self.stop]

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0 or self.top_k == 1


@dataclass
class GuidedDecodingParams:
    """Grammar-constrained decoding spec (reference: llmapi GuidedDecodingParams)."""

    json: Optional[Union[str, dict]] = None
    json_object: bool = False
    regex: Optional[str] = None
    grammar: Optional[str] = None
    choice: Optional[List[str]] = None
    # xgrammar-style structural tag (reference GuidedDecodingParams
    # .structural_tag): JSON with {"structures": [{"begin", "schema",
    # "end"}...], "triggers": [...]} — free text until a trigger string is
    # emitted, then the matching begin+schema+end structure is enforced.
    structural_tag: Optional[Union[str, dict]] = None
