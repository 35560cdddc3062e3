"""Speculative decoding tests: outputs must be IDENTICAL to plain greedy."""

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.speculative import SpeculativeConfig, SpeculativeMode

TINY = dict(vocab_size=64, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


def make_llm(spec=None, seed=0):
    cfg = ModelConfig(**TINY)
    return LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
               max_batch_size=8, kv_num_blocks=128, kv_block_size=8,
               speculative_config=spec, seed=seed)


def greedy(llm, prompt, n=24):
    out = llm.generate(list(prompt),
                       SamplingParams(max_tokens=n, temperature=0.0,
                                      ignore_eos=True))
    return out[0].outputs[0].token_ids


def test_ngram_spec_matches_plain_greedy():
    # small vocab => repetitive sequences => ngram hits
    prompt = [3, 5, 3, 5, 3, 5, 7]
    base = make_llm()
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    spec = SpeculativeConfig(mode=SpeculativeMode.NGRAM, max_draft_len=4)
    llm = make_llm(spec=spec)
    try:
        got = greedy(llm, prompt)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want
    assert stats["rounds"] > 0, stats


def test_draft_target_spec_matches_plain_greedy():
    prompt = [9, 2, 9, 2, 11]
    base = make_llm()
    try:
        want = greedy(base, prompt, n=16)
    finally:
        base.shutdown()

    # draft model == target architecture with the same seed weights: the
    # proposals should nearly always be accepted
    spec = SpeculativeConfig(mode=SpeculativeMode.DRAFT_TARGET,
                             max_draft_len=3,
                             draft_model=ModelConfig(**TINY))
    llm = make_llm(spec=spec)
    try:
        got = greedy(llm, prompt, n=16)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want
    assert stats["rounds"] > 0
    # note: draft weights are random-initialized separately, so acceptance
    # may be low — correctness (exact greedy match) is the invariant.


def test_spec_skipped_for_sampled_requests():
    spec = SpeculativeConfig(mode=SpeculativeMode.NGRAM, max_draft_len=4)
    llm = make_llm(spec=spec)
    try:
        out = llm.generate([1, 2, 1, 2, 1], SamplingParams(
            max_tokens=8, temperature=1.0, ignore_eos=True))
        assert len(out[0].outputs[0].token_ids) == 8
    finally:
        llm.shutdown()


def test_mtp_spec_matches_plain_greedy():
    """One-model MTP: output identical to plain greedy even with an
    untrained (random) MTP head — verification enforces correctness."""
    prompt = [2, 9, 2, 9, 2, 9, 11]
    base = make_llm(seed=5)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    spec = SpeculativeConfig(mode=SpeculativeMode.MTP, max_draft_len=3)
    llm = make_llm(spec=spec, seed=5)
    try:
        got = greedy(llm, prompt)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0, stats


def test_mtp_spec_with_chunked_prefill_and_batch():
    """MTP hidden bookkeeping survives chunked prefill + batched requests."""
    spec = SpeculativeConfig(mode=SpeculativeMode.MTP, max_draft_len=4)
    base = make_llm(seed=6)
    prompts = [list(np.random.RandomState(i).randint(1, 60, 20 + i))
               for i in range(4)]
    try:
        want = [greedy(base, p, n=10) for p in prompts]
    finally:
        base.shutdown()
    llm = make_llm(spec=spec, seed=6)
    try:
        outs = llm.generate(prompts, SamplingParams(
            max_tokens=10, temperature=0.0, ignore_eos=True))
        got = [o.outputs[0].token_ids for o in outs]
    finally:
        llm.shutdown()
    assert got == want


def test_user_provided_spec_matches_plain_greedy():
    prompt = [4, 8, 4, 8, 4, 8, 15]
    base = make_llm(seed=2)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    # adversarially bad proposer: repeats the last token
    spec = SpeculativeConfig(
        mode=SpeculativeMode.USER_PROVIDED, max_draft_len=3,
        proposer=lambda req: [req.all_token_ids[-1]] * 3)
    llm = make_llm(spec=spec, seed=2)
    try:
        got = greedy(llm, prompt)
    finally:
        llm.shutdown()
    assert got == want


def test_eagle3_spec_matches_plain_greedy():
    """EAGLE3-style one-model drafting (3-layer feature fusion) keeps greedy
    output identical; catch-up uses 3H taps, chain uses own H hiddens."""
    prompt = [6, 3, 6, 3, 6, 3, 12]
    base = make_llm(seed=8)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    spec = SpeculativeConfig(mode=SpeculativeMode.EAGLE3, max_draft_len=3)
    llm = make_llm(spec=spec, seed=8)
    try:
        got = greedy(llm, prompt)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0, stats


def test_eagle3_reduced_draft_vocab_d2t():
    """EAGLE3 checkpoint with a reduced draft vocab: draft head scores only
    draft_vocab ids and d2t translates them to target ids; greedy output
    stays identical to the plain model (target verification)."""
    prompt = [6, 3, 6, 3, 6, 3, 12]
    base = make_llm(seed=8)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    V, H = TINY["vocab_size"], TINY["hidden_size"]
    dv = V // 2
    rng = np.random.RandomState(1)
    weights = {
        # draft head over the reduced vocab (quality irrelevant: target
        # verification enforces correctness)
        "lm_head.weight": rng.randn(dv, H).astype(np.float32) * 0.05,
        # draft id d -> target id 2d (offset table, reference d2t format)
        "d2t": np.arange(dv, dtype=np.int64),
    }
    spec = SpeculativeConfig(mode=SpeculativeMode.EAGLE3, max_draft_len=3,
                             mtp_weights=weights.get)
    llm = make_llm(spec=spec, seed=8)
    try:
        drafter = llm.executor.drafter
        assert drafter.d2t is not None
        assert drafter.params["draft_head"].shape == (H, dv)
        # translation: draft id d maps to 2d, always in target range
        assert drafter._to_target(5) == 10
        got = greedy(llm, prompt)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0, stats


def test_mtp_spec_under_tp_matches_plain_greedy():
    """One-model MTP with a tensor-parallel mesh: the drafter block runs
    inside shard_map with the engine's own layer specs."""
    from tensorrt_llm_tpu.parallel.mapping import Mapping

    prompt = [2, 9, 2, 9, 2, 9, 11]
    base = make_llm(seed=5)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    spec = SpeculativeConfig(mode=SpeculativeMode.MTP, max_draft_len=3)
    cfg = ModelConfig(**TINY, mapping=Mapping(tp_size=2))
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=8, kv_num_blocks=128, kv_block_size=8,
              speculative_config=spec, seed=5)
    try:
        got = greedy(llm, prompt)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0, stats


@pytest.mark.parametrize("mode", ["ngram", "mtp"])
def test_spec_under_attention_dp_matches_plain_greedy(mode):
    """Speculative decoding with attention-DP: verify passes are replicated
    with owner-masked KV writes; one-model drafter pools are dp-sharded."""
    prompts = [[3, 5, 3, 5, 3, 5, 7], [2, 9, 2, 9, 2, 9, 11],
               [7, 7, 7, 7, 1]]
    base = make_llm(seed=5)
    try:
        want = [greedy(base, p) for p in prompts]
    finally:
        base.shutdown()

    if mode == "ngram":
        spec = SpeculativeConfig(mode=SpeculativeMode.NGRAM, max_draft_len=4)
    else:
        spec = SpeculativeConfig(mode=SpeculativeMode.MTP, max_draft_len=3)
    cfg = ModelConfig(**TINY)
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=8, kv_num_blocks=128, kv_block_size=8,
              speculative_config=spec, seed=5, data_parallel_size=2)
    try:
        got = [greedy(llm, p) for p in prompts]
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0, stats


def test_save_hidden_states_mode(tmp_path):
    """SAVE_HIDDEN_STATES (reference save_hidden_state.py): requests decode
    normally while the hidden tap records every position; finished requests
    land in .npz shards with one hidden row per token."""
    import numpy as np
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.speculative import SpeculativeConfig, SpeculativeMode
    from tensorrt_llm_tpu.speculative.save_hidden import (
        load_hidden_state_shards)

    H = 64
    cfg = ModelConfig(vocab_size=64, hidden_size=H, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position=128)
    spec = SpeculativeConfig(mode=SpeculativeMode.SAVE_HIDDEN_STATES,
                             save_dir=str(tmp_path), save_write_interval=1)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   speculative_config=spec)
    sp = tllm.SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]
    outs = llm.generate(prompts, sp)
    ref = [o.outputs[0].token_ids for o in outs]
    llm.shutdown()

    recs = load_hidden_state_shards(str(tmp_path))
    assert len(recs) == 2
    by_len = sorted(recs, key=lambda r: len(r["input_ids"]))
    for rec, prompt, out in zip(by_len, [prompts[1], prompts[0]],
                                [ref[1], ref[0]]):
        ids = rec["input_ids"].tolist()
        assert ids[:len(prompt)] == prompt
        assert rec["hidden_state"].shape[1] == H
        assert rec["hidden_state"].shape[0] == len(ids)
        # every captured row is a real activation, not padding
        assert (np.abs(rec["hidden_state"]).sum(axis=1) > 0).all()


# ------------------------------------------- relaxed thinking acceptance ----
# reference MTPDecodingConfig use_relaxed_acceptance_for_thinking /
# relaxed_topk / relaxed_delta (mtp.py:798-845 + mtp_relaxed_acceptance_op)

def test_relaxed_accept_unit():
    from tensorrt_llm_tpu.runtime.executor import PyExecutor
    row = np.log(np.array([0.5, 0.3, 0.15, 0.05]))
    # token 1: in top-2, gap 0.2 <= 0.25 -> accept
    assert PyExecutor._relaxed_accept(row, 1, topk=2, delta=0.25)
    # gap 0.2 > 0.1 -> reject
    assert not PyExecutor._relaxed_accept(row, 1, topk=2, delta=0.1)
    # token 2 not in top-2 -> reject even with a huge delta
    assert not PyExecutor._relaxed_accept(row, 2, topk=2, delta=1.0)
    # topk=1 + delta=0 degenerates to strict greedy
    assert PyExecutor._relaxed_accept(row, 0, topk=1, delta=0.0)
    assert not PyExecutor._relaxed_accept(row, 1, topk=1, delta=0.0)


def test_relaxed_acceptance_inside_thinking_only():
    """With a huge delta/topk, every draft inside <think> is accepted (so
    outputs follow the DRAFTER), while outside <think> acceptance stays
    strict greedy."""
    BT, ET = 60, 61  # begin/end thinking token ids

    def const_drafter(request):
        return [9, 9, 9, 9]

    def run(prompt, relaxed):
        spec = SpeculativeConfig(
            mode=SpeculativeMode.USER_PROVIDED, proposer=const_drafter,
            max_draft_len=4,
            use_relaxed_acceptance_for_thinking=relaxed,
            relaxed_topk=TINY["vocab_size"], relaxed_delta=1.0,
            begin_thinking_phase_token=BT, end_thinking_phase_token=ET)
        llm = make_llm(spec=spec)
        try:
            return greedy(llm, [prompt], n=8)
        finally:
            llm.shutdown()

    # prompt ends inside a thinking span -> relaxed accepts the drafted 9s
    think = run([3, 5, BT, 7], relaxed=True)
    assert think[:4].count(9) >= 3, think
    # same prompt, strict mode -> follows plain greedy exactly
    strict = run([3, 5, BT, 7], relaxed=False)
    base = make_llm()
    try:
        want = greedy(base, [[3, 5, BT, 7]], n=8)
    finally:
        base.shutdown()
    assert strict == want
    # prompt whose thinking span already CLOSED -> relaxed must not apply
    closed = run([3, BT, 5, ET, 7], relaxed=True)
    base = make_llm()
    try:
        want2 = greedy(base, [[3, BT, 5, ET, 7]], n=8)
    finally:
        base.shutdown()
    assert closed == want2


def test_relaxed_exits_on_end_token():
    """Once the END thinking token is generated, acceptance reverts to
    strict: drafts that only survived via relaxation stop being accepted."""
    BT, ET = 60, 61

    def drafter(request):
        # always draft [ET, 9, 9]: the ET closes the span; the following
        # 9s must then be verified STRICTLY
        return [ET, 9, 9]

    spec = SpeculativeConfig(
        mode=SpeculativeMode.USER_PROVIDED, proposer=drafter,
        max_draft_len=3,
        use_relaxed_acceptance_for_thinking=True,
        relaxed_topk=TINY["vocab_size"], relaxed_delta=1.0,
        begin_thinking_phase_token=BT, end_thinking_phase_token=ET)
    llm = make_llm(spec=spec)
    try:
        got = greedy(llm, [[3, 5, BT, 7]], n=8)
    finally:
        llm.shutdown()
    # got[0] comes from prefill (strict greedy); the first spec round then
    # relaxed-accepts the drafted ET, which CLOSES the span mid-chunk — the
    # following 9-drafts must be verified strictly, so everything after
    # the ET equals plain greedy continuation of the accepted prefix.
    assert got[1] == ET, got
    base = make_llm()
    try:
        prefix = [3, 5, BT, 7] + got[:2]
        want_tail = greedy(base, [prefix], n=len(got) - 2)
    finally:
        base.shutdown()
    assert got[2:] == want_tail, (got, want_tail)


def test_draft_len_schedule_caps_drafts():
    """reference draft_len_schedule: {batch_threshold: draft_len} — the
    largest threshold <= batch size picks the per-round draft cap."""
    lens = []

    def drafter(request):
        return [9] * 6   # always offers 6; the schedule must cap it

    spec = SpeculativeConfig(
        mode=SpeculativeMode.USER_PROVIDED, proposer=drafter,
        max_draft_len=6, draft_len_schedule={1: 2})
    llm = make_llm(spec=spec)
    try:
        llm.generate([[3, 5, 3, 5]],
                     SamplingParams(max_tokens=10, temperature=0.0,
                                    ignore_eos=True))
        st = dict(llm.executor.spec_stats)
    finally:
        llm.shutdown()
    assert st["rounds"] > 0
    # every round proposed at most 2 drafts (schedule), never 6
    assert st["proposed"] <= 2 * st["rounds"], st


def test_acceptance_window_disables_speculation():
    """reference acceptance_window/acceptance_length_threshold: a full
    window averaging below the threshold turns speculation off."""

    def bad_drafter(request):
        return [63, 62, 61]   # junk drafts: acceptance stays ~1 (bonus)

    spec = SpeculativeConfig(
        mode=SpeculativeMode.USER_PROVIDED, proposer=bad_drafter,
        max_draft_len=3, acceptance_window=3,
        acceptance_length_threshold=1.5)
    llm = make_llm(spec=spec)
    try:
        llm.generate([[3, 5, 3, 5]],
                     SamplingParams(max_tokens=20, temperature=0.0,
                                    ignore_eos=True))
        rounds = llm.executor.spec_stats["rounds"]
        off = llm.executor._spec_adaptive_off
    finally:
        llm.shutdown()
    assert off, "speculation should have been disabled"
    assert rounds <= 4, rounds  # 3-round window + at most one extra


def test_medusa_spec_matches_plain_greedy():
    """Medusa: K independent heads off the last hidden; random heads still
    yield exact greedy output (target verification)."""
    prompt = [7, 4, 7, 4, 7, 4, 13]
    base = make_llm(seed=9)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    spec = SpeculativeConfig(mode=SpeculativeMode.MEDUSA, max_draft_len=3)
    llm = make_llm(spec=spec, seed=9)
    try:
        got = greedy(llm, prompt)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0, stats


def test_medusa_tree_choices_matches_plain_greedy():
    """Medusa with a candidate tree (medusa_choices paths) through the
    ancestor-masked tree verification."""
    prompt = [7, 4, 7, 4, 7, 4, 13]
    base = make_llm(seed=9)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()

    spec = SpeculativeConfig(
        mode=SpeculativeMode.MEDUSA, max_draft_len=4, num_medusa_heads=3,
        medusa_choices=[(0,), (1,), (0, 0), (0, 1), (1, 0), (0, 0, 0)])
    llm = make_llm(spec=spec, seed=9)
    try:
        got = greedy(llm, prompt)
    finally:
        llm.shutdown()
    assert got == want, (got, want)


def test_medusa_trained_heads_accept():
    """Heads loaded from a weight source that mimics the TARGET's own
    next-token behavior accept drafts (sanity that acceptance can be > 0
    and the ResBlock weight path loads)."""
    import numpy as np
    H, V = TINY["hidden_size"], TINY["vocab_size"]
    rng = np.random.RandomState(3)
    weights = {}
    for i in range(2):
        weights[f"medusa_head.{i}.1.weight"] = \
            rng.randn(V, H).astype(np.float32) * 0.02
        weights[f"medusa_head.{i}.0.linear.weight"] = \
            rng.randn(H, H).astype(np.float32) * 0.02
    spec = SpeculativeConfig(mode=SpeculativeMode.MEDUSA, max_draft_len=2,
                             num_medusa_heads=2, mtp_weights=weights.get)
    llm = make_llm(spec=spec, seed=3)
    try:
        drafter = llm.executor.drafter
        got = greedy(llm, [1, 2, 1, 2, 1], n=8)
        assert drafter.params["head"].shape == (2, H, V)
        assert len(got) == 8
    finally:
        llm.shutdown()


def test_spec_skipped_for_logprobs_and_generation_logits():
    """Spec accept loops bypass _sample_and_update, so requests recording
    logprobs or generation logits must take the normal path — their
    per-token rows must stay aligned with token_ids."""
    import numpy as np
    spec = SpeculativeConfig(mode=SpeculativeMode.NGRAM, max_draft_len=4)
    llm = make_llm(spec=spec)
    try:
        sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True,
                            logprobs=1, return_generation_logits=True)
        out = llm.generate([[3, 5, 3, 5, 3, 5, 7]], sp)[0].outputs[0]
        assert len(out.logprobs) == len(out.token_ids) == 8
        assert out.generation_logits.shape[0] == 8
        assert [int(t) for t in np.argmax(out.generation_logits, -1)] \
            == out.token_ids
    finally:
        llm.shutdown()


def test_spec_respects_stop_strings_and_penalties():
    """Host logit controls (stop strings, penalties) only apply on the
    host sampling path — requests using them must bypass speculation and
    match the drafter-free output exactly."""
    class Tok:
        eos_token_id = 0
        bos_token_id = None
        chat_template = None

        def encode(self, text):
            return [max(1, ord(c) % 64) for c in text] or [1]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(48 + (i % 40)) for i in ids)

    def run(spec):
        cfg = ModelConfig(**TINY)
        llm = LLM(model=cfg, tokenizer=Tok(), max_seq_len=128,
                  max_batch_size=8, kv_num_blocks=128, kv_block_size=8,
                  speculative_config=spec, seed=4)
        try:
            sp = SamplingParams(max_tokens=24, temperature=0.0,
                                ignore_eos=True, repetition_penalty=1.4)
            out = llm.generate("ababab", sp)[0].outputs[0]
            # also with a stop string derived from the plain run
            return out.token_ids
        finally:
            llm.shutdown()

    plain = run(None)
    specd = run(SpeculativeConfig(mode=SpeculativeMode.NGRAM,
                                  max_draft_len=4))
    assert specd == plain, (specd, plain)


def test_spec_pending_tree_kv_flushed_when_gate_flips():
    """Tree-verified KV deferred to ride the next spec chunk must be
    flushed when the spec gate turns off (max_concurrency exceeded) —
    otherwise the normal decode path reads never-written KV."""
    def tree_proposer(request):
        last = request.all_token_ids[-1]
        return [last, 9, last], [-1, -1, 0]

    spec = SpeculativeConfig(
        mode=SpeculativeMode.USER_PROVIDED, tree_proposer=tree_proposer,
        proposer=lambda req: [],
        max_draft_len=3, max_concurrency=1)
    prompts = [[3, 5, 3, 5, 3], [7, 2, 7, 2, 7]]
    base = make_llm(seed=12)
    try:
        want = [greedy(base, [p], n=12) for p in prompts]
    finally:
        base.shutdown()
    llm = make_llm(spec=spec, seed=12)
    try:
        # request A runs alone first (spec ON, builds spec_pending), then
        # request B arrives: batch of 2 > max_concurrency=1 flips the
        # gate OFF while A may hold pending tree KV
        futA = llm.generate_async(prompts[0], SamplingParams(
            max_tokens=12, temperature=0.0, ignore_eos=True))
        import time
        time.sleep(1.0)   # let A run a few spec rounds
        futB = llm.generate_async(prompts[1], SamplingParams(
            max_tokens=12, temperature=0.0, ignore_eos=True))
        got = [futA.result(timeout=300).outputs[0].token_ids,
               futB.result(timeout=300).outputs[0].token_ids]
    finally:
        llm.shutdown()
    assert got == want, (got, want)


def test_eagle3_loads_full_draft_layer():
    """A full EAGLE3 checkpoint (fc + head + d2t + midlayer.*) must load
    the draft decoder layer too — a fc/head-only load left the block
    random-initialized with near-zero acceptance."""
    import numpy as np
    V, H = TINY["vocab_size"], TINY["hidden_size"]
    I = TINY["intermediate_size"]
    heads, kvh, hd = TINY["num_heads"], TINY["num_kv_heads"], TINY["head_dim"]
    rng = np.random.RandomState(2)
    w = {
        "fc.weight": rng.randn(H, 3 * H).astype(np.float32) * 0.02,
        "lm_head.weight": rng.randn(V, H).astype(np.float32) * 0.02,
        "midlayer.input_layernorm.weight": np.ones(H, np.float32) * 1.5,
        "midlayer.post_attention_layernorm.weight": np.ones(H, np.float32),
        "midlayer.self_attn.q_proj.weight":
            rng.randn(heads * hd, H).astype(np.float32) * 0.02,
        "midlayer.self_attn.k_proj.weight":
            rng.randn(kvh * hd, H).astype(np.float32) * 0.02,
        "midlayer.self_attn.v_proj.weight":
            rng.randn(kvh * hd, H).astype(np.float32) * 0.02,
        "midlayer.self_attn.o_proj.weight":
            rng.randn(H, heads * hd).astype(np.float32) * 0.02,
        "midlayer.mlp.gate_proj.weight":
            rng.randn(I, H).astype(np.float32) * 0.02,
        "midlayer.mlp.up_proj.weight":
            rng.randn(I, H).astype(np.float32) * 0.02,
        "midlayer.mlp.down_proj.weight":
            rng.randn(H, I).astype(np.float32) * 0.02,
        "midlayer.hidden_norm.weight": np.ones(H, np.float32) * 2.0,
        "norm.weight": np.ones(H, np.float32) * 3.0,
    }
    spec = SpeculativeConfig(mode=SpeculativeMode.EAGLE3, max_draft_len=2,
                             mtp_weights=w.get)
    llm = make_llm(spec=spec, seed=8)
    try:
        d = llm.executor.drafter
        # the trained layer norms landed (not the random/ones init)
        assert float(np.asarray(d.params["layer"]["input_norm"])[0]) == 1.5
        assert float(np.asarray(d.params["hnorm"])[0]) == 2.0
        assert float(np.asarray(d.params["final_norm"])[0]) == 3.0
        got = greedy(llm, [6, 3, 6, 3, 6, 3, 12], n=8)
        assert len(got) == 8
    finally:
        llm.shutdown()
