"""One-model MTP (multi-token prediction) speculative decoding.

Counterpart of the reference's MTP path (`_torch/speculative/mtp.py`,
`modeling_deepseekv3.py:717` MTP head; DeepSeek-V3 technical report §2.2):
the target model's final hidden states feed a single extra decoder block

    x_p = eh_proj( [enorm(emb(token_p)) ; hnorm(h_{p-1})] )

whose output predicts token_{p+1}.  The MTP block keeps its own single-layer
paged KV pool but *shares the main sequence's block tables and slot
mapping* — the block allocator already reserved those pages, so the drafter
adds zero bookkeeping.  Draft chaining feeds the block its own output hidden
(the reference's "MTP Eagle" chain style).

Rejected-draft KV hygiene: chain steps write MTP KV at future positions;
when drafts are rejected those entries are garbage, but every position is
re-written with the real (hidden, token) pair as the accepted stream passes
it, and zero-initialized pages are benign to attend — correctness is always
enforced by target verification, the drafter only affects acceptance rate.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tensorrt_llm_tpu.runtime.model_engine import PAD_SLOT
from tensorrt_llm_tpu.speculative.interface import Drafter, SpeculativeConfig
from tensorrt_llm_tpu.utils import logger

_BUCKETS = (8, 64, 512)


class _MtpSeq:
    __slots__ = ("next_query", "hid")

    def __init__(self):
        self.next_query = 1    # first MTP query position
        self.hid: Dict[int, np.ndarray] = {}  # position -> target hidden


class MTPDrafter(Drafter):
    needs_hidden = True
    hidden_capture = "final"   # engine tap: "final" | "eagle3" (3-layer)

    def __init__(self, cfg: SpeculativeConfig, llm_args=None):
        self.cfg = cfg
        self._seqs: Dict[int, _MtpSeq] = {}
        self._fns = {}
        self.engine = None
        self.h_dim = None          # width of tapped hiddens (set in bind)
        # EAGLE3 reduced draft vocab: d2t[d] is the offset from draft token
        # id d to its target-vocab id (reference _torch/speculative/eagle3.py
        # d2t tensor); None = draft head shares the target vocab
        self.d2t: Optional[np.ndarray] = None

    def _to_target(self, draft_id: int) -> int:
        """Map a draft-vocab token id to the target vocab."""
        if self.d2t is None:
            return int(draft_id)
        return int(draft_id + self.d2t[draft_id])

    # ---- binding -------------------------------------------------------------
    def bind(self, engine, kv):
        """Build the MTP block against the target model's config; called by
        PyExecutor once the engine exists."""
        import jax
        import jax.numpy as jnp
        from tensorrt_llm_tpu.models.modeling_utils import DecoderLayer

        mp = engine.mapping
        if getattr(engine, "pp_size", 1) > 1 or mp.cp_size > 1:
            raise NotImplementedError(
                "one-model MTP under PP/CP lands in a later round")
        self.engine = engine
        self.kv = kv
        cfg = engine.model.cfg
        self.model_cfg = cfg
        self.h_dim = cfg.hidden_size
        self.layer = DecoderLayer(cfg, cfg.num_layers)  # extra block
        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        H = cfg.hidden_size
        self.params = {
            "enorm": jnp.ones((H,), jnp.float32),
            "hnorm": jnp.ones((H,), jnp.float32),
            "eh_proj": (jax.random.normal(k1, (2 * H, H), jnp.float32)
                        * (0.5 / (2 * H) ** 0.5)).astype(cfg.dtype),
            "final_norm": jnp.ones((H,), jnp.float32),
            "layer": self.layer.init(k2),
        }
        if self.cfg.mtp_weights is not None:
            self.load_weights(self.cfg.mtp_weights)
        # Single-layer pool sharing the main pool geometry.  Under
        # attention-DP kv.num_blocks is the PER-RANK count while _place()
        # shards the block axis over 'dp' — size the global axis as
        # num_blocks * dp_size (matching DpKVCacheManager.allocate_pools) so
        # each rank's shard covers the full rank-local slot-id range.
        n_blocks = kv.num_blocks * max(getattr(kv, "dp_size", 1), 1)
        if cfg.is_mla:
            shape = (n_blocks, 1, kv.block_size, cfg.kv_pool_dim)
            self.pool = jnp.zeros(shape, jnp.bfloat16)
        else:
            shape = (n_blocks, cfg.num_kv_heads, kv.block_size,
                     cfg.head_dim)
            self.pool = (jnp.zeros(shape, jnp.bfloat16),
                         jnp.zeros(shape, jnp.bfloat16))

    def load_weights(self, get_tensor, layer_prefix: Optional[str] = None):
        """Load MTP weights from a DeepSeek checkpoint (stored as the extra
        layer `model.layers.{num_hidden_layers}.` with enorm/hnorm/eh_proj)."""
        import jax.numpy as jnp
        cfg = self.model_cfg
        pre = layer_prefix or f"model.layers.{cfg.num_layers}."

        def t(name):
            arr = get_tensor(pre + name)
            return None if arr is None else jnp.asarray(
                np.asarray(arr)).astype(jnp.float32).T

        def vec(name):
            arr = get_tensor(pre + name)
            return None if arr is None else jnp.asarray(
                np.asarray(arr)).astype(jnp.float32)

        eh = t("eh_proj.weight")
        if eh is None:
            logger.warning("MTP weights not found at %s*", pre)
            return
        required = ("enorm.weight", "hnorm.weight",
                    "shared_head.norm.weight", "input_layernorm.weight",
                    "post_attention_layernorm.weight")
        missing = [n for n in required if get_tensor(pre + n) is None]
        if missing:
            # a None smuggled into params would only surface as an opaque
            # trace-time TypeError deep inside the first propose()
            raise ValueError(f"partial MTP checkpoint: missing "
                             f"{[pre + n for n in missing]}")
        from tensorrt_llm_tpu.models import get_model_class
        loader = get_model_class(cfg.architecture)(cfg)
        self.params.update({
            "enorm": vec("enorm.weight"),
            "hnorm": vec("hnorm.weight"),
            "eh_proj": eh.astype(cfg.dtype),
            "final_norm": vec("shared_head.norm.weight"),
            "layer": {
                "input_norm": vec("input_layernorm.weight"),
                "post_attn_norm": vec("post_attention_layernorm.weight"),
                "attn": loader._load_attn(
                    self.layer, pre,
                    lambda n: t(n[len(pre):]), lambda n: vec(n[len(pre):])),
                "mlp": loader._load_mlp(
                    self.layer, lambda n: get_tensor(n), pre, t=lambda n: t(
                        n[len(pre):])),
            },
        })

    def _place(self):
        """Under a TP/EP mesh, place the drafter block's params/pool with
        the SAME specs the engine uses for a decoder layer, so the jitted
        pass runs inside shard_map exactly like a main-model layer (psum
        row-parallel outputs, ep-sharded experts).  Lazy: Eagle3 adds
        fc/draft_head after super().bind()."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.engine.mesh is None or getattr(self, "_placed", False):
            return
        from tensorrt_llm_tpu.runtime.model_engine import prune_specs
        specs = {
            "enorm": P(), "hnorm": P(), "eh_proj": P(), "final_norm": P(),
            "layer": prune_specs(self.layer.param_specs(),
                                 self.params["layer"]),
        }
        for k in ("fc", "draft_head"):
            if k in self.params:
                specs[k] = P()
        put = lambda tree, sp: jax.device_put(tree, jax.tree.map(
            lambda x: NamedSharding(self.engine.mesh, x), sp,
            is_leaf=lambda x: isinstance(x, P)))
        self.params = put(self.params, specs)
        self._specs = specs
        self._pool_spec = jax.tree.map(self.engine._cache_leaf_spec,
                                       self.pool)
        self.pool = put(self.pool, self._pool_spec)
        self._placed = True

    # ---- jitted forward --------------------------------------------------------
    def _get_fn(self, m: int, h_in: int):
        import jax
        import jax.numpy as jnp
        from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
        from tensorrt_llm_tpu.ops.norms import add_rms_norm, rms_norm

        key = (m, h_in)
        if key in self._fns:
            return self._fns[key]
        self._place()
        model = self.engine.model
        cfg = self.model_cfg
        layer = self.layer
        eps = cfg.rms_eps
        apply_fc = h_in != cfg.hidden_size  # EAGLE3: fc fuses the 3H capture

        def fwd(main_params, mtp_params, pool, hiddens, tokens, positions,
                slots, block_table, kv_len, q_offset, last_idx):
            emb = model.embedding(main_params["embedding"], tokens)
            hh = hiddens.astype(emb.dtype)
            if apply_fc:
                hh = jnp.dot(hh, mtp_params["fc"].astype(emb.dtype),
                             preferred_element_type=jnp.float32
                             ).astype(emb.dtype)
            e = rms_norm(emb, mtp_params["enorm"], eps)
            h = rms_norm(hh, mtp_params["hnorm"], eps)
            x = jnp.dot(jnp.concatenate([e, h], axis=-1),
                        mtp_params["eh_proj"].astype(emb.dtype),
                        preferred_element_type=jnp.float32).astype(emb.dtype)
            meta = AttentionMetadata(
                positions=positions, slot_mapping=slots,
                block_tables=block_table.reshape(1, -1),
                kv_lens=kv_len.reshape(1),
                q_offset=q_offset, mode="prefill")
            rope_tables = (main_params["rope"], main_params.get("rope_local"))
            out, residual, pool = layer(
                mtp_params["layer"], x, None, rope_tables, pool, meta)
            hfin, _ = add_rms_norm(out, residual, mtp_params["final_norm"], eps)
            h_last = hfin[last_idx]
            if "draft_head" in mtp_params:
                # EAGLE3 reduced-vocab draft head; ids translate via d2t
                logits = jnp.dot(
                    h_last[None], mtp_params["draft_head"].astype(h_last.dtype),
                    preferred_element_type=jnp.float32)
            elif cfg.tie_word_embeddings:
                logits = jnp.dot(
                    h_last[None],
                    main_params["embedding"]["weight"].T.astype(h_last.dtype),
                    preferred_element_type=jnp.float32)
            else:
                logits = model.lm_head(
                    main_params["lm_head"], h_last[None]).astype(jnp.float32)
                if (model.lm_head.tp_mode == "column"
                        and cfg.mapping.tp_size > 1):
                    from tensorrt_llm_tpu.parallel.ops import tp_all_gather
                    logits = tp_all_gather(logits, axis=-1)
            return logits, h_last[None], pool

        if self.engine.mesh is not None:
            from jax.sharding import PartitionSpec as P
            if cfg.mapping.dp_size > 1:
                # attention-DP: replicated compute, owner-masked writes into
                # the dp-sharded drafter pool; outputs come back dp-stacked
                # and the host reads the owner band (same pattern as the
                # engine's ADP prefill)
                d = P("dp")
                data = (P(), P(), P(), d, d, d, P(), P())
                out = (d, d, self._pool_spec)
            else:
                data = (P(),) * 8
                out = (P(), P(), self._pool_spec)
            fwd = jax.shard_map(
                fwd, mesh=self.engine.mesh,
                in_specs=(self.engine._param_specs, self._specs,
                          self._pool_spec, *data),
                out_specs=out, check_vma=False)
        self._fns[key] = jax.jit(fwd, donate_argnums=(2,))
        return self._fns[key]

    def _run(self, hiddens, tokens, positions, rid):
        logits, h = self._run_logits(hiddens, tokens, positions, rid)
        return self._to_target(int(np.argmax(logits))), h

    def _run_logits(self, hiddens, tokens, positions, rid):
        """One drafter pass over contiguous query positions; returns
        (logits [V] f32, hidden_out)."""
        import jax.numpy as jnp
        m = len(tokens)
        mp = next(b for b in _BUCKETS if b >= min(m, _BUCKETS[-1]))
        H = int(np.asarray(hiddens).shape[-1])
        hid = np.zeros((mp, H), np.float32)
        hid[:m] = np.asarray(hiddens, np.float32)
        tok = np.zeros(mp, np.int32)
        tok[:m] = tokens
        pos = np.minimum(positions[0] + np.arange(mp, dtype=np.int32),
                         self.engine.max_seq_len - 1)
        dp = self.engine.mapping.dp_size
        owner = self.kv.rank_of(rid) if dp > 1 else 0
        mb = self.engine.max_blocks_per_seq
        slots = np.full(max(dp, 1) * mp, np.int32(PAD_SLOT), np.int32)
        slots[owner * mp:owner * mp + m] = \
            self.kv.slot_mapping(rid, int(positions[0]), m)
        table = np.zeros((max(dp, 1), mb), np.int32)
        table[owner] = np.asarray(self.kv.block_table(rid, mb), np.int32)
        kv_len = np.full(max(dp, 1), positions[0] + m, np.int32)
        fn = self._get_fn(mp, H)
        logits, h_last, self.pool = fn(
            self.engine.params, self.params, self.pool,
            jnp.asarray(hid), jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray(slots),
            jnp.asarray(table if dp > 1 else table[0]),
            jnp.asarray(kv_len if dp > 1 else kv_len[0]),
            jnp.asarray(np.int32(positions[0])),
            jnp.asarray(np.int32(m - 1)))
        return (np.asarray(logits, np.float32)[owner],
                np.asarray(h_last, np.float32)[owner])

    # ---- executor hooks -----------------------------------------------------------
    def on_hidden(self, request, start_pos: int, hiddens: np.ndarray):
        """Target hiddens for positions start_pos..start_pos+len-1."""
        seq = self._seqs.setdefault(request.request_id, _MtpSeq())
        for j in range(hiddens.shape[0]):
            seq.hid[start_pos + j] = hiddens[j]

    def _catch_up(self, request):
        """Run the MTP block over the contiguous run of query positions
        ending at n-1 whose pair (h_{p-1}, t_p) is known; returns
        (rid, n, root_logits, root_hidden) or None.  A hidden gap below the
        run (e.g. prefix-reuse skipped rows) only leaves stale MTP KV behind
        — that costs acceptance rate, never correctness."""
        if self.engine is None:
            return None
        rid = request.request_id
        seq = self._seqs.get(rid)
        if seq is None or not seq.hid:
            return None
        toks = request.all_token_ids
        n = len(toks)
        # prune hiddens below any possible catch-up use BEFORE the early
        # returns: under sustained KV pressure the exits below used to
        # leak one H/3H vector per decoded token for the request's whole
        # lifetime.  The run reads hid[p-1] for p >= max(next_query, 1)
        # (and probes one below), so entries under next_query - 2 are dead.
        floor = max(seq.next_query, 1) - 2
        # hard cap: if catch-up keeps failing (sustained KV pressure) the
        # run can never cover more than ~2 chunks anyway — dropping older
        # hiddens only shortens the catch-up run (acceptance, not
        # correctness)
        floor = max(floor, n - 2 * _BUCKETS[-1])
        if floor > 0:
            seq.hid = {p: v for p, v in seq.hid.items() if p >= floor}
        if n < 2 or (n - 2) not in seq.hid:
            return None  # freshest pair missing; nothing to chain from
        lo = n - 1
        while lo > max(seq.next_query, 1) and (lo - 2) in seq.hid:
            lo -= 1
        queries = list(range(lo, n))
        k = self.cfg.max_draft_len
        if self.cfg.tree_branches:
            # tree expansion writes drafter KV one position per LEVEL —
            # cover the deeper of chain length and tree depth
            k = max(k, len(self.cfg.tree_branches))
        need_tokens = n + k - 1
        if self.kv.blocks_needed(need_tokens) - self.kv.num_seq_blocks(rid) \
                > self.kv.num_free_blocks:
            return None
        self.kv.grow_sequence(rid, need_tokens)

        hs = [seq.hid[p - 1] for p in queries]
        ts = [toks[p] for p in queries]
        ps = np.array(queries, np.int32)
        # long catch-ups in chunks of the largest bucket
        step = _BUCKETS[-1]
        logits, h_out = None, None
        for lo in range(0, len(queries), step):
            logits, h_out = self._run_logits(
                np.stack(hs[lo:lo + step]), ts[lo:lo + step],
                ps[lo:lo + step], rid)
        seq.next_query = n
        # keep only the last hidden (chain seeds from MTP's own outputs)
        seq.hid = {p: v for p, v in seq.hid.items() if p >= n - 2}
        return rid, n, logits, h_out

    def propose(self, request) -> List[int]:
        got = self._catch_up(request)
        if got is None:
            return []
        rid, n, logits, h_out = got
        k = self.cfg.max_draft_len
        draft = [self._to_target(int(np.argmax(logits)))]
        pos = n
        while len(draft) < k and pos < self.engine.max_seq_len - 1:
            tok_out, h_out = self._run(
                h_out[None], [draft[-1]], np.array([pos], np.int32), rid)
            draft.append(tok_out)
            pos += 1
        return draft

    def propose_tree(self, request):
        """EAGLE-style static tree: expand top-b_i children per node at
        level i (reference tree drafting configs); sibling steps overwrite
        each other's drafter KV slots — acceptance-rate noise only, the
        target verification enforces correctness."""
        branches = self.cfg.tree_branches
        if not branches:
            return None
        got = self._catch_up(request)
        if got is None:
            return None
        rid, n, logits, h_root = got
        tokens: List[int] = []
        parents: List[int] = []
        frontier = [(-1, logits, h_root)]
        pos = n
        for level, b in enumerate(branches):
            nxt = []
            for pnode, lg, h in frontier:
                for t in np.argsort(lg)[::-1][:max(int(b), 1)]:
                    tt = self._to_target(int(t))
                    tokens.append(tt)
                    parents.append(pnode)
                    if (level + 1 < len(branches)
                            and pos < self.engine.max_seq_len - 1):
                        lg2, h2 = self._run_logits(
                            h[None], [tt], np.array([pos], np.int32),
                            rid)
                        nxt.append((len(tokens) - 1, lg2, h2))
            frontier = nxt
            pos += 1
            if not frontier:
                break
        return tokens, parents

    def on_request_finished(self, request):
        self._seqs.pop(request.request_id, None)
