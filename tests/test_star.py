"""Star-attention context parallelism on the virtual CPU mesh.

Reference: CpType.STAR (`attention_backend/star_flashinfer.py`; paper
arXiv:2411.17116) — contiguous per-rank KV chunks, communication-free
[anchor; chunk] local prefill, decode via per-rank partial attention +
softmax-stat combine.  With cp=2 the anchor (= rank 0's chunk) gives rank 1
the FULL prefix, so outputs must match dense attention exactly; cp>2 is
approximate by design (structural checks only)."""

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.runtime.kv_cache_manager import (KVCacheConfig,
                                                       StarKVCacheManager)

from test_helix import TINY, build as _build_helix, random_sd, run


def build(mapping, sd):
    from tensorrt_llm_tpu.models import get_model_class
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    cfg = ModelConfig(**TINY, mapping=mapping)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(sd.get)
    kv = StarKVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim,
                            num_blocks_per_rank=32, cp_size=mapping.cp_size)
    engine = ModelEngine(model, params, kv, mapping=mapping, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(64,))
    return engine, kv


@pytest.mark.parametrize("tp", [1, 2])
def test_star_cp2_matches_dense(tp):
    if len(jax.devices()) < 2 * tp:
        pytest.skip("not enough devices")
    sd = random_sd(0)
    prompt = list(np.random.RandomState(1).randint(1, 255, 26))
    e1, kv1 = _build_helix(Mapping(), sd)
    ref = run(e1, kv1, prompt)
    es, kvs = build(Mapping(tp_size=tp, cp_size=2, cp_type="star"), sd)
    got = run(es, kvs, prompt)
    np.testing.assert_allclose(ref, got, rtol=3e-2, atol=3e-2)
    assert (np.argmax(ref, -1) == np.argmax(got, -1)).all()


def test_star_cp4_runs_and_is_sane():
    """cp=4 is approximate (blocks 1..r-1 unseen by rank r's prefill):
    require finite logits and that decode produces a coherent greedy path."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    sd = random_sd(0)
    prompt = list(np.random.RandomState(2).randint(1, 255, 33))
    es, kvs = build(Mapping(cp_size=4, cp_type="star"), sd)
    got = run(es, kvs, prompt)
    assert np.isfinite(got).all()
    assert got.shape[-1] == TINY["vocab_size"]


def test_star_manager_geometry():
    kv = StarKVCacheManager(KVCacheConfig(block_size=8), 2, 4, 32,
                            num_blocks_per_rank=16, cp_size=2)
    kv.add_sequence(1, list(range(20)))   # 3 prompt blocks -> bpr 2
    assert kv.bounds_of(1) == [0, 16]
    assert kv.anchor_len(1) == 16
    kv.grow_sequence(1, 20)
    assert kv.ranks[0].num_seq_blocks(1) == 2   # [0, 16)
    assert kv.ranks[1].num_seq_blocks(1) == 1   # [16, ...)
    assert kv.rank_local_len(1, 20, 0) == 16
    assert kv.rank_local_len(1, 20, 1) == 4
    maps = kv.rank_slot_mapping(1, 0, 20, pad_slot=-1)
    for p in range(20):
        owner = 0 if p < 16 else 1
        for r in range(2):
            assert (maps[r][p] >= 0) == (r == owner)
    # generated tokens keep appending to the open-ended last region
    kv.grow_sequence(1, 40)
    assert kv.rank_local_len(1, 40, 0) == 16
    assert kv.rank_local_len(1, 40, 1) == 24
    assert kv.rank_of_pos(1, 39) == 1
    kv.free_sequence(1)
    assert kv.num_seq_blocks(1) == 0


def test_star_through_llm_api():
    """Full stack: LLM(context_parallel_type="star") greedy == dense."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    prompt = [int(x) for x in np.random.RandomState(7).randint(1, 255, 26)]
    sp = tllm.SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    kw = dict(skip_tokenizer_init=True, max_seq_len=64, max_batch_size=4,
              kv_num_blocks=64, kv_block_size=8, seed=11)
    base = tllm.LLM(model=ModelConfig(**TINY), **kw)
    try:
        want = base.generate([prompt], sp)[0].outputs[0].token_ids
    finally:
        base.shutdown()
    star = tllm.LLM(model=ModelConfig(**TINY), context_parallel_size=2,
                    context_parallel_type="star", **kw)
    try:
        got = star.generate([prompt], sp)[0].outputs[0].token_ids
    finally:
        star.shutdown()
    assert got == want, (got, want)


def test_star_cp2_with_sinks_matches_dense():
    """Sinks under star CP: local-softmax denominator in phase 1, combined
    denominator in phase 2 — cp=2 must match dense exactly."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    from tensorrt_llm_tpu.models import get_model_class
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine

    sd = random_sd(5)
    rng = np.random.RandomState(9)
    for i in range(TINY["num_layers"]):
        sd[f"model.layers.{i}.self_attn.sinks"] = \
            rng.randn(TINY["num_heads"]).astype(np.float32)

    def build_s(mapping):
        cfg = ModelConfig(**TINY, mapping=mapping, has_sinks=True)
        model = get_model_class(cfg.architecture)(cfg)
        params = model.load_hf_weights(sd.get)
        if mapping.cp_size > 1:
            kv = StarKVCacheManager(
                KVCacheConfig(block_size=8), cfg.num_layers,
                cfg.num_kv_heads, cfg.head_dim, num_blocks_per_rank=32,
                cp_size=mapping.cp_size)
        else:
            kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                                cfg.num_kv_heads, cfg.head_dim,
                                num_blocks=64)
        return ModelEngine(model, params, kv, mapping=mapping,
                           max_seq_len=64, decode_buckets=(4,),
                           prefill_buckets=(64,)), kv

    prompt = list(np.random.RandomState(4).randint(1, 255, 26))
    e1, kv1 = build_s(Mapping())
    ref = run(e1, kv1, prompt)
    es, kvs = build_s(Mapping(cp_size=2, cp_type="star"))
    got = run(es, kvs, prompt)
    np.testing.assert_allclose(ref, got, rtol=3e-2, atol=3e-2)
    assert (np.argmax(ref, -1) == np.argmax(got, -1)).all()
