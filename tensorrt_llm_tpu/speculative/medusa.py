"""Medusa speculative decoding (multiple independent draft heads).

Counterpart of the reference's Medusa path (`MedusaDecodingConfig`,
`llmapi/llm_args.py:832`; medusa heads in `_torch` model defs): K extra
heads read the target's LAST hidden state and independently predict tokens
t+1 .. t+K — no draft KV, no chaining.  Each head is the standard Medusa
ResBlock + vocab projection:

    logits_i = (h + silu(h @ W_res_i)) @ W_head_i

Chain proposals take each head's argmax; tree proposals expand
``medusa_choices`` paths (node at depth d = head d's nth-best candidate)
into the executor's ancestor-masked tree verification.  Head quality only
affects acceptance rate — target verification enforces exact greedy.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tensorrt_llm_tpu.speculative.interface import Drafter, SpeculativeConfig


class MedusaDrafter(Drafter):
    needs_hidden = True
    hidden_capture = "final"

    def __init__(self, cfg: SpeculativeConfig, llm_args=None):
        self.cfg = cfg
        self.num_heads = cfg.num_medusa_heads or cfg.max_draft_len
        self.choices = [tuple(c) for c in (cfg.medusa_choices or [])]
        self._last: Dict[int, np.ndarray] = {}   # rid -> last-token hidden
        self.params = None
        self._fwd = None

    # ---- weights -----------------------------------------------------------
    def bind(self, engine, kv):
        import jax
        import jax.numpy as jnp

        cfg = engine.model.cfg
        H, V = cfg.hidden_size, cfg.vocab_size
        get = self.cfg.mtp_weights  # same weight-source hook as MTP/EAGLE
        heads, res = [], []
        for i in range(self.num_heads):
            w = get(f"medusa_head.{i}.1.weight") if get else None   # [V, H]
            r = (get(f"medusa_head.{i}.0.linear.weight")
                 if get else None)                                  # [H, H]
            rng = np.random.RandomState(1000 + i)
            heads.append(np.asarray(w, np.float32).T if w is not None
                         else rng.randn(H, V).astype(np.float32) * 0.02)
            res.append(np.asarray(r, np.float32).T if r is not None
                       else np.zeros((H, H), np.float32))  # identity block
        self.params = {"res": jnp.stack(res), "head": jnp.stack(heads)}

        def fwd(params, h):             # h [H] -> logits [K, V]
            x = h[None, :] + jax.nn.silu(
                jnp.einsum("h,khj->kj", h, params["res"]))
            return jnp.einsum("kh,khv->kv", x, params["head"])

        self._fwd = jax.jit(fwd)

    # ---- executor hooks ------------------------------------------------------
    def on_hidden(self, request, start_pos: int, hiddens: np.ndarray):
        # the LAST row is the newest accepted token's hidden — all K heads
        # read only that one
        self._last[request.request_id] = np.asarray(hiddens[-1], np.float32)

    def _head_logits(self, request) -> Optional[np.ndarray]:
        h = self._last.get(request.request_id)
        if h is None or self.params is None:
            return None
        import jax.numpy as jnp
        return np.asarray(self._fwd(self.params, jnp.asarray(h)))

    def propose(self, request) -> List[int]:
        logits = self._head_logits(request)
        if logits is None:
            return []
        k = min(self.num_heads, self.cfg.max_draft_len)
        return [int(t) for t in np.argmax(logits[:k], axis=-1)]

    def propose_tree(self, request):
        """medusa_choices -> (tokens, parents): each choice is a path of
        per-depth candidate ranks (reference medusa tree, e.g. mc_sim_7b);
        prefixes must be present for parents to resolve."""
        if not self.choices:
            return None
        logits = self._head_logits(request)
        if logits is None:
            return None
        width = 1 + max((max(c) for c in self.choices if c), default=0)
        # per-head top-`width` candidates, rank-ordered
        top = np.argsort(-logits, axis=-1)[:, :width]     # [K, width]
        index = {}                                        # path -> node idx
        tokens, parents = [], []
        for path in sorted(self.choices, key=len):
            depth = len(path) - 1
            if depth >= self.num_heads:
                continue
            parent = index.get(path[:-1], -1) if depth else -1
            tokens.append(int(top[depth, path[-1]]))
            parents.append(parent)
            index[path] = len(tokens) - 1
        return tokens, parents

    def on_request_finished(self, request):
        self._last.pop(request.request_id, None)
