"""Draft-TREE speculative decoding: outputs must be IDENTICAL to plain
greedy regardless of what the tree proposes (correctness is enforced by
target verification; the tree only moves the acceptance rate).

Reference: tree drafting + packed spec-dec masks
(kernels/speculativeDecoding/, convertSpecDecodingMaskToPackedMaskOp)."""

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.speculative import SpeculativeConfig, SpeculativeMode

TINY = dict(vocab_size=64, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


def make_llm(spec=None, seed=0, **extra_cfg):
    cfg = ModelConfig(**{**TINY, **extra_cfg})
    return LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
               max_batch_size=8, kv_num_blocks=128, kv_block_size=8,
               speculative_config=spec, seed=seed)


def greedy(llm, prompt, n=24):
    out = llm.generate(list(prompt),
                       SamplingParams(max_tokens=n, temperature=0.0,
                                      ignore_eos=True))
    return out[0].outputs[0].token_ids


def junk_tree(request):
    """Adversarial proposer: random tokens in a 2-level tree."""
    rng = np.random.default_rng(request.num_tokens)
    toks, parents = [], []
    for r in range(3):                    # 3 roots
        toks.append(int(rng.integers(1, 63)))
        parents.append(-1)
    for r in range(3):                    # one child each
        toks.append(int(rng.integers(1, 63)))
        parents.append(r)
    return toks, parents


def test_junk_tree_preserves_greedy_output():
    prompt = [3, 5, 3, 5, 3, 5, 7]
    base = make_llm()
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()
    spec = SpeculativeConfig(mode=SpeculativeMode.USER_PROVIDED,
                             tree_proposer=junk_tree, max_draft_len=6)
    llm = make_llm(spec=spec)
    try:
        got = greedy(llm, prompt)
        stats = llm.executor.spec_stats
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0


def test_oracle_tree_accepts_deep_paths():
    """An oracle proposer (clone model) should get multi-token acceptance,
    and outputs still match exactly."""
    prompt = [2, 9, 2, 9, 11]
    base = make_llm()
    try:
        want = greedy(base, prompt, n=20)
    finally:
        base.shutdown()

    oracle = make_llm()  # same seed => same weights

    def oracle_tree(request, _oracle=oracle):
        ids = list(request.all_token_ids)
        out = _oracle.generate(
            ids, SamplingParams(max_tokens=3, temperature=0.0,
                                ignore_eos=True))
        chain = out[0].outputs[0].token_ids
        # linear chain + one junk sibling at the root
        toks = [chain[0], 63] + list(chain[1:])
        parents = [-1, -1, 0, 2]
        return toks[:4], parents[:len(toks)][:4]

    spec = SpeculativeConfig(mode=SpeculativeMode.USER_PROVIDED,
                             tree_proposer=oracle_tree, max_draft_len=6)
    llm = make_llm(spec=spec)
    try:
        got = greedy(llm, prompt, n=20)
        stats = dict(llm.executor.spec_stats)
    finally:
        llm.shutdown()
        oracle.shutdown()
    assert got == want, (got, want)
    # oracle drafts should be accepted at depth (> 1 token/round avg)
    assert stats["accepted"] >= stats["rounds"], stats


def test_mtp_tree_matches_plain_greedy():
    prompt = [4, 8, 4, 8, 15]
    base = make_llm(seed=3)
    try:
        want = greedy(base, prompt)
    finally:
        base.shutdown()
    spec = SpeculativeConfig(mode=SpeculativeMode.MTP, max_draft_len=4,
                             tree_branches=(2, 2))
    llm = make_llm(spec=spec, seed=3)
    try:
        got = greedy(llm, prompt)
        stats = dict(llm.executor.spec_stats)
    finally:
        llm.shutdown()
    assert got == want, (got, want)
    assert stats["rounds"] > 0


def test_tree_with_vswa_sliding_layers():
    """Tree verification over cyclic-ring pools (sliding layers)."""
    prompt = list(range(2, 22))
    swa = dict(sliding_window=16, sliding_window_pattern=2, num_layers=3)
    base = make_llm(seed=5, **swa)
    try:
        assert base.engine._vswa
        want = greedy(base, prompt)
    finally:
        base.shutdown()
    spec = SpeculativeConfig(mode=SpeculativeMode.USER_PROVIDED,
                             tree_proposer=junk_tree, max_draft_len=6)
    llm = make_llm(spec=spec, seed=5, **swa)
    try:
        got = greedy(llm, prompt)
    finally:
        llm.shutdown()
    assert got == want, (got, want)


def test_tree_then_stop_flushes_pending():
    """max_tokens hit mid-tree-round: request finishes cleanly; a following
    request on the same LLM still decodes correctly."""
    spec = SpeculativeConfig(mode=SpeculativeMode.USER_PROVIDED,
                             tree_proposer=junk_tree, max_draft_len=6)
    llm = make_llm(spec=spec)
    try:
        out = llm.generate([[7, 7, 7]], SamplingParams(
            max_tokens=3, temperature=0.0, ignore_eos=True))
        assert len(out[0].outputs[0].token_ids) == 3
        out2 = llm.generate([[9, 1, 9]], SamplingParams(
            max_tokens=5, temperature=0.0, ignore_eos=True))
        assert len(out2[0].outputs[0].token_ids) == 5
    finally:
        llm.shutdown()
