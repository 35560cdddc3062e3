"""Two-model draft-target speculation.

Counterpart of the reference's `_torch/speculative/model_drafter.py`: a small
draft model with its own engine + paged KV proposes greedy tokens; the target
verifies.  The draft KV stays position-addressed, so rejected positions are
simply overwritten when the accepted stream advances past them.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from tensorrt_llm_tpu.speculative.interface import Drafter, SpeculativeConfig
from tensorrt_llm_tpu.utils import logger


class _DraftSeq:
    __slots__ = ("cached_len",)

    def __init__(self):
        self.cached_len = 0  # tokens whose KV the draft model has seen


class DraftTargetDrafter(Drafter):
    def __init__(self, cfg: SpeculativeConfig, llm_args=None):
        import jax
        from tensorrt_llm_tpu.models import get_model_class
        from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
        from tensorrt_llm_tpu.runtime.kv_cache_manager import (
            KVCacheConfig, KVCacheManager)
        from tensorrt_llm_tpu.runtime.model_engine import ModelEngine

        self.cfg = cfg
        dm = cfg.draft_model
        if isinstance(dm, ModelConfig):
            mc = dm
            params = None
        else:
            from transformers import AutoConfig
            mc = ModelConfig.from_hf_config(AutoConfig.from_pretrained(dm))
            params = None
        model = get_model_class(mc.architecture)(mc)
        if params is None and not isinstance(dm, ModelConfig):
            from tensorrt_llm_tpu.llmapi.llm import _has_weights, _safetensors_reader
            if _has_weights(str(dm)):
                params = model.load_hf_weights(_safetensors_reader(str(dm)))
        if params is None:
            params = model.init(jax.random.PRNGKey(0))
        max_seq = getattr(llm_args, "max_seq_len", 2048) if llm_args else 2048
        kvcfg = KVCacheConfig(block_size=16, enable_block_reuse=False)
        num_blocks = max(256, (max_seq // 16) * 64)
        self.kv = KVCacheManager(kvcfg, mc.num_layers, mc.num_kv_heads,
                                 mc.head_dim, num_blocks)
        self.engine = ModelEngine(model, params, self.kv, max_seq_len=max_seq,
                                  decode_buckets=(8,),
                                  prefill_buckets=(16, 64, 256, 1024))
        self._seqs: Dict[int, _DraftSeq] = {}

    def _catch_up(self, request) -> int:
        """Feed the draft model any accepted tokens it hasn't seen; returns
        the argmax of the last position (first draft proposal)."""
        from tensorrt_llm_tpu.runtime.request import LlmRequest
        seq = self._seqs.get(request.request_id)
        toks = request.all_token_ids
        rid = request.request_id
        if seq is None:
            seq = self._seqs[rid] = _DraftSeq()
            self.kv.add_sequence(rid, toks)
        # delta = tokens [cached_len, len-?]: feed all but produce logits at end
        delta = toks[seq.cached_len:]
        if not delta:
            return -1
        shim = _Shim(rid, toks, seq.cached_len)
        self.kv.grow_sequence(rid, len(toks))
        inputs = self.engine.prepare_prefill_inputs(shim, len(delta))
        logits = self.engine.run_prefill(inputs)
        seq.cached_len = len(toks)
        return int(np.argmax(np.asarray(logits[0])))

    def propose(self, request) -> List[int]:
        first = self._catch_up(request)
        if first < 0:
            return []
        draft = [first]
        rid = request.request_id
        seq = self._seqs[rid]
        toks = list(request.all_token_ids)
        # greedy decode the remaining draft tokens
        for _ in range(self.cfg.max_draft_len - 1):
            toks_plus = toks + draft
            shim = _Shim(rid, toks_plus, seq.cached_len)
            self.kv.grow_sequence(rid, len(toks_plus))
            inputs = self.engine.prepare_prefill_inputs(
                shim, len(toks_plus) - seq.cached_len)
            logits = self.engine.run_prefill(inputs)
            seq.cached_len = len(toks_plus)
            draft.append(int(np.argmax(np.asarray(logits[0]))))
        return draft

    def on_accepted(self, request, accepted_tokens):
        seq = self._seqs.get(request.request_id)
        if seq is not None:
            # rejected draft KV gets overwritten; cap the cached pointer at
            # what the *target* accepted
            seq.cached_len = min(seq.cached_len, request.num_tokens)

    def on_request_finished(self, request):
        if request.request_id in self._seqs:
            self.kv.free_sequence(request.request_id)
            del self._seqs[request.request_id]


class _Shim:
    """Duck-typed request view for ModelEngine.prepare_prefill_inputs."""

    def __init__(self, request_id, tokens, context_position):
        self.request_id = request_id
        self.prompt_token_ids = tokens
        self.context_position = context_position
