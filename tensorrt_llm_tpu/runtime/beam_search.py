"""Beam search over the paged KV cache.

Counterpart of the reference's beam-search decoding stack
(`cpp/tensorrt_llm/layers/beamSearchLayer.cu`, `kernels/beamSearchKernels/`,
driven by `GptDecoderBatched`): beams are separate paged KV sequences that
share their immutable prefix blocks by ref count (`fork_sequence`) and get a
private device-copied tail block, so a beam fork costs one page copy instead
of a whole-sequence copy (the same block-sharing idea as the reference's
per-beam block tables in `kvCacheManager.h` GenerationRequest).

Each executor iteration advances one decode step for all live beams of a
request as one batched dispatch; candidate selection/reordering is host-side
numpy (k*V is tiny).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from tensorrt_llm_tpu.runtime.request import FinishReason, LlmRequest


class _BeamSeq:
    """Duck-typed stand-in for LlmRequest in engine.prepare_decode_inputs."""

    __slots__ = ("request_id", "tokens", "lps")

    def __init__(self, request_id: int, tokens: List[int],
                 lps: Optional[List[float]] = None):
        self.request_id = request_id
        self.tokens = tokens
        # per-OUTPUT-token logprob of the chosen extension (reference
        # returns beam logprobs alongside cumulative scores)
        self.lps = lps if lps is not None else []

    @property
    def all_token_ids(self) -> List[int]:
        return self.tokens

    @property
    def num_tokens(self) -> int:
        return len(self.tokens)


def _log_softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def _new_seq_id() -> int:
    LlmRequest._id_counter += 1
    return LlmRequest._id_counter


class BeamSearch:
    """Beam state machine for one request."""

    def __init__(self, req: LlmRequest, kv, engine, eos_token_id: Optional[int],
                 max_seq_len: int):
        sp = req.sampling_params
        self.req = req
        self.kv = kv
        self.engine = engine
        self.width = sp.best_of or sp.n
        # Variable-Beam-Width-Search (reference beam_width_array,
        # sampling_params.py:186): per-step beam width; the last entry
        # holds for all later steps.  Widening forks extra children from
        # the best parents; narrowing frees the dropped beams' KV.
        self.width_array = list(sp.beam_width_array or [])
        self._step_idx = 0
        if self.width_array:
            self.width = self.width_array[0]
        self.eos = sp.end_id if sp.end_id is not None else eos_token_id
        self.max_seq_len = max_seq_len
        self.length_penalty = getattr(sp, "length_penalty", 0.0)
        self.live: List[Tuple[_BeamSeq, float]] = []    # (seq, cum_logp)
        # finished entries: (output tokens, score, per-token logprobs)
        self.finished: List[Tuple[List[int], float, List[float]]] = []
        self.done = False
        # attention-DP: all beams of a request live on the owner replica
        self.owner = (kv.rank_of(req.request_id)
                      if getattr(kv, "dp_size", 1) > 1 else 0)

    # ---- lifecycle -------------------------------------------------------------
    def init_from_logits(self, logits_row: np.ndarray):
        """Seed width beams from the prefill logits (top-width first tokens).
        Beam 0 inherits the request's KV sequence; others fork it."""
        logp = _log_softmax(np.asarray(logits_row, np.float32))
        top = np.argsort(logp)[::-1][: self.width]
        prompt = list(self.req.prompt_token_ids)
        # Fork ALL non-root beams from the request's sequence before any
        # _admit: if beam 0 finishes immediately (max_tokens==1 or EOS is the
        # argmax token), _admit frees its sequence and a later fork from it
        # would raise.  Ring pairs mirror step(): VSWA sliding-layer rings
        # need their own slot copies at seeding too.
        seeded = []
        for j, tok in enumerate(top):
            if j == 0:
                sid = self.req.request_id
            else:
                sid = _new_seq_id()
                self.engine.copy_kv_blocks(
                    self.kv.fork_sequence(self.req.request_id, sid),
                    getattr(self.kv, "ring_fork_pairs",
                            lambda *a: None)(self.req.request_id, sid),
                    owner=self.owner)
            seeded.append((sid, int(tok)))
        for sid, tok in seeded:
            self._admit(_BeamSeq(sid, prompt + [tok],
                                 [float(logp[tok])]), float(logp[tok]))
        self._check_done()

    def _score(self, tokens_out_len: int, cum: float) -> float:
        if self.length_penalty > 0:
            return cum / (tokens_out_len ** self.length_penalty)
        return cum

    def _admit(self, seq: _BeamSeq, cum: float):
        """Place a freshly-extended beam into live or finished."""
        out_len = seq.num_tokens - self.req.prompt_len
        hit_eos = (self.eos is not None
                   and not self.req.sampling_params.ignore_eos
                   and seq.tokens[-1] == self.eos)
        stop_ids = self.req.sampling_params.stop_token_ids or ()
        hit_eos = hit_eos or seq.tokens[-1] in stop_ids
        at_cap = (out_len >= self.req.sampling_params.max_tokens
                  or seq.num_tokens >= self.max_seq_len)
        if hit_eos or at_cap:
            self.finished.append((seq.tokens[self.req.prompt_len:],
                                  self._score(out_len, cum),
                                  list(seq.lps)))
            self.kv.free_sequence(seq.request_id)
        else:
            self.live.append((seq, cum))

    # ---- one decode step ---------------------------------------------------------
    def step(self):
        """One batched decode step over all live beams + beam reordering."""
        if self.done:
            return
        self._step_idx += 1
        if self.width_array:
            self.width = self.width_array[
                min(self._step_idx, len(self.width_array) - 1)]
        k = len(self.live)
        seqs = [s for s, _ in self.live]
        cums = np.array([c for _, c in self.live], np.float32)
        for s in seqs:
            self.kv.grow_sequence(s.request_id, s.num_tokens)
        inputs = self.engine.prepare_decode_inputs(seqs)
        logits = np.asarray(self.engine.run_decode(inputs), np.float32)
        if inputs.row_map is not None:
            # attention-DP: gather beam rows back from rank-grouped layout
            logits = logits[inputs.row_map]
        logits = logits[:k]
        logp = _log_softmax(logits)                      # [k, V]
        V = logp.shape[1]
        cand = (cums[:, None] + logp).reshape(-1)        # [k*V]
        # 2k candidates cover the worst case of k eos-hits + k continuations
        n_cand = min(2 * self.width, cand.size)
        idx = np.argpartition(cand, -n_cand)[-n_cand:]
        idx = idx[np.argsort(cand[idx])[::-1]]

        # choose successors best-first
        new_live: List[Tuple[int, int, float]] = []      # (parent, tok, cum)
        for flat in idx:
            parent, tok = divmod(int(flat), V)
            out_len = seqs[parent].num_tokens + 1 - self.req.prompt_len
            hit_eos = (self.eos is not None
                       and not self.req.sampling_params.ignore_eos
                       and tok == self.eos) or \
                tok in (self.req.sampling_params.stop_token_ids or ())
            at_cap = (out_len >= self.req.sampling_params.max_tokens
                      or seqs[parent].num_tokens + 1 >= self.max_seq_len)
            if hit_eos or at_cap:
                if len(self.finished) < 2 * self.width:
                    self.finished.append(
                        (seqs[parent].tokens[self.req.prompt_len:] + [tok],
                         self._score(out_len, float(cand[flat])),
                         seqs[parent].lps + [float(logp[parent, tok])]))
            else:
                if len(new_live) < self.width:
                    new_live.append((parent, tok, float(cand[flat])))
            if len(new_live) >= self.width:
                break

        # re-sequence KV: first child of a parent inherits its sequence,
        # further children fork it; childless parents are freed
        children_of = {}
        for j, (parent, _, _) in enumerate(new_live):
            children_of.setdefault(parent, []).append(j)
        next_live: List[Optional[Tuple[_BeamSeq, float]]] = [None] * len(new_live)
        used = set()
        for parent, childs in children_of.items():
            pseq = seqs[parent]
            used.add(parent)
            for ci, j in enumerate(childs):
                _, tok, cum = new_live[j]
                if ci == 0:
                    sid = pseq.request_id
                else:
                    sid = _new_seq_id()
                    self.engine.copy_kv_blocks(
                        self.kv.fork_sequence(pseq.request_id, sid),
                        getattr(self.kv, "ring_fork_pairs",
                                lambda *a: None)(pseq.request_id, sid),
                        owner=self.owner)
                next_live[j] = (_BeamSeq(
                    sid, pseq.tokens + [tok],
                    pseq.lps + [float(logp[parent, tok])]), cum)
        for i, s in enumerate(seqs):
            if i not in used:
                self.kv.free_sequence(s.request_id)
        self.live = [b for b in next_live if b is not None]
        self._check_done()

    def _check_done(self):
        if self.live and len(self.finished) >= self.width:
            best_live = max(c for _, c in self.live)
            worst_kept = sorted((t[1] for t in self.finished),
                                reverse=True)[self.width - 1]
            # logp sums only decrease (length_penalty 0); live beams can't
            # beat the kept set any more
            if self.length_penalty == 0 and best_live <= worst_kept:
                self._finalize()
                return
        if not self.live:
            self._finalize()

    def _finalize(self):
        for s, c in self.live:
            out_len = s.num_tokens - self.req.prompt_len
            self.finished.append((s.tokens[self.req.prompt_len:],
                                  self._score(max(out_len, 1), c),
                                  list(s.lps)))
            self.kv.free_sequence(s.request_id)
        self.live = []
        self.finished.sort(key=lambda t: t[1], reverse=True)
        self.finished = self.finished[: self.width]
        self.done = True

    # ---- results --------------------------------------------------------------
    def apply_to_request(self):
        """Write the best beam into the request and finish it."""
        req = self.req
        n = min(req.sampling_params.n, len(self.finished))
        req.beam_outputs = [
            {"token_ids": toks, "cumulative_logprob": score,
             "logprobs": ([{t: lp} for t, lp in zip(toks, lps)]
                          if self.req.sampling_params.logprobs else None)}
            for toks, score, lps in self.finished[:n]]
        best = self.finished[0][0] if self.finished else []
        req.output_token_ids = list(best)
        reason = (FinishReason.EOS if best and self.eos is not None
                  and best[-1] == self.eos else FinishReason.LENGTH)
        req.finish(reason)
        req.emit(finished=True)
