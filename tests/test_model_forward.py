"""Model forward correctness: paged-cache equivalence + HF parity.

The cache-equivalence tests are the strongest invariants we have without
golden data: prefilling in different chunkings and decoding from the cache
must reproduce the same logits the model gives when it sees the whole
sequence at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheConfig, KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams

TINY = dict(
    vocab_size=256,
    hidden_size=128,
    intermediate_size=256,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=32,
    max_position=256,
)


def make_engine(seed=0, **overrides):
    cfg = ModelConfig(**{**TINY, **overrides})
    model = get_model_class(cfg.architecture)(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    kvcfg = KVCacheConfig(block_size=8)
    kv = KVCacheManager(kvcfg, cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                        num_blocks=64)
    engine = ModelEngine(model, params, kv, max_seq_len=128,
                         decode_buckets=(4, 8), prefill_buckets=(16, 32, 64))
    return engine, kv


def prefill_all(engine, kv, req, chunks):
    """Prefill a request in the given chunk sizes; returns final-chunk logits."""
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    req.start_context()
    logits = None
    for c in chunks:
        start = req.context_position
        kv.grow_sequence(req.request_id, start + c)
        logits = engine.run_prefill(engine.prepare_prefill_inputs(req, c))
        req.context_position += c
    return np.asarray(logits[0], np.float32)


def test_chunked_prefill_matches_single_chunk():
    prompt = list(np.random.RandomState(0).randint(1, 255, 24))
    engine, kv = make_engine()
    r1 = LlmRequest(list(prompt), SamplingParams(max_tokens=4))
    l1 = prefill_all(engine, kv, r1, [24])
    r2 = LlmRequest(list(prompt), SamplingParams(max_tokens=4))
    l2 = prefill_all(engine, kv, r2, [8, 8, 8])
    np.testing.assert_allclose(l1, l2, rtol=3e-2, atol=3e-2)


def test_decode_matches_prefill_logits():
    """Logits for token t from decode-with-cache == prefill over prefix+t."""
    prompt = list(np.random.RandomState(1).randint(1, 255, 16))
    engine, kv = make_engine()

    # path A: prefill the first 15, then decode token 16
    rA = LlmRequest(list(prompt[:15]), SamplingParams(max_tokens=4))
    prefill_all(engine, kv, rA, [15])
    rA.finish_context()
    rA.append_token(prompt[15])
    kv.grow_sequence(rA.request_id, rA.num_tokens)
    logits_A = np.asarray(
        engine.run_decode(engine.prepare_decode_inputs([rA]))[0], np.float32)

    # path B: prefill all 16 at once
    rB = LlmRequest(list(prompt), SamplingParams(max_tokens=4))
    logits_B = prefill_all(engine, kv, rB, [16])

    np.testing.assert_allclose(logits_A, logits_B, rtol=3e-2, atol=3e-2)


def test_batched_decode_matches_single():
    prompt1 = list(np.random.RandomState(2).randint(1, 255, 10))
    prompt2 = list(np.random.RandomState(3).randint(1, 255, 13))
    engine, kv = make_engine()

    outs = {}
    reqs = {}
    for name, p in (("a", prompt1), ("b", prompt2)):
        r = LlmRequest(list(p), SamplingParams(max_tokens=4))
        prefill_all(engine, kv, r, [len(p)])
        r.finish_context()
        r.append_token(p[-1] % 200 + 1)
        kv.grow_sequence(r.request_id, r.num_tokens)
        reqs[name] = r

    # single decodes
    for name, r in reqs.items():
        outs[name] = np.asarray(
            engine.run_decode(engine.prepare_decode_inputs([r]))[0], np.float32)

    # rebuild fresh caches and decode as one batch
    engine2, kv2 = make_engine()
    rs = []
    for name, p in (("a", prompt1), ("b", prompt2)):
        r = LlmRequest(list(p), SamplingParams(max_tokens=4))
        prefill_all(engine2, kv2, r, [len(p)])
        r.finish_context()
        r.append_token(p[-1] % 200 + 1)
        kv2.grow_sequence(r.request_id, r.num_tokens)
        rs.append(r)
    batched = np.asarray(
        engine2.run_decode(engine2.prepare_decode_inputs(rs)), np.float32)
    np.testing.assert_allclose(batched[0], outs["a"], rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(batched[1], outs["b"], rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("arch,extra", [
    ("LlamaForCausalLM", {}),
    ("Qwen2ForCausalLM", {"attention_bias": True}),
    ("Qwen3ForCausalLM", {"qk_norm": True}),
])
def test_hf_parity_tiny(arch, extra):
    """Randomly-initialized HF model vs ours (unquantized weight transfer)."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg_cls = {
        "LlamaForCausalLM": transformers.LlamaConfig,
        "Qwen2ForCausalLM": transformers.Qwen2Config,
        "Qwen3ForCausalLM": transformers.Qwen3Config,
    }[arch]
    hf_cfg = hf_cfg_cls(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, tie_word_embeddings=False,
        attention_dropout=0.0)
    torch.manual_seed(0)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    hf_model.eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = arch
    model = get_model_class(arch)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n), dtype=jnp.float32)

    prompt = list(np.random.RandomState(0).randint(1, 255, 12))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].numpy()

    kvcfg = KVCacheConfig(block_size=8)
    kv = KVCacheManager(kvcfg, cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                        num_blocks=32)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(16,))
    r = LlmRequest(list(prompt), SamplingParams(max_tokens=1))
    ours = prefill_all(engine, kv, r, [12])

    # bf16 compute vs fp32 HF: compare top-1 and correlation
    assert np.argmax(ours) == np.argmax(hf_logits), (
        np.argsort(ours)[-3:], np.argsort(hf_logits)[-3:])
    corr = np.corrcoef(ours, hf_logits)[0, 1]
    assert corr > 0.99, corr
