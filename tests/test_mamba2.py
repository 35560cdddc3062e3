"""Mamba2: SSD ops vs naive recurrence; HF parity; chunked-prefill exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops.ssm import (
    causal_conv1d_chunk,
    causal_conv1d_step,
    ssd_chunked,
    ssd_decode_step,
)


def naive_scan(x, dt, A, B, C, D, state):
    """Token-by-token reference recurrence (f64)."""
    T, H, P = x.shape
    N = B.shape[-1]
    ys = []
    s = np.asarray(state, np.float64)
    for t in range(T):
        dA = np.exp(np.asarray(dt[t], np.float64)[:, None, None]
                    * np.asarray(A, np.float64)[:, None, None])
        dBx = (np.asarray(dt[t], np.float64)[:, None, None]
               * np.asarray(B[t], np.float64)[:, None, :]
               * np.asarray(x[t], np.float64)[:, :, None])
        s = s * dA + dBx
        y = np.einsum("hpn,hn->hp", s, np.asarray(C[t], np.float64))
        ys.append(y + np.asarray(D, np.float64)[:, None]
                  * np.asarray(x[t], np.float64))
    return np.stack(ys), s


def rand_inputs(T=13, H=4, P=8, N=16, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(T, H, P).astype(np.float32) * 0.5)
    dt = jnp.asarray(np.abs(r.randn(T, H)).astype(np.float32) * 0.3)
    A = jnp.asarray(-np.abs(r.randn(H)).astype(np.float32))
    B = jnp.asarray(r.randn(T, H, N).astype(np.float32) * 0.3)
    C = jnp.asarray(r.randn(T, H, N).astype(np.float32) * 0.3)
    D = jnp.asarray(r.randn(H).astype(np.float32))
    return x, dt, A, B, C, D


def test_ssd_chunked_matches_naive_recurrence():
    x, dt, A, B, C, D = rand_inputs()
    prev = jnp.zeros((4, 8, 16), jnp.float32)
    y, final = ssd_chunked(x, dt, A, B, C, D, prev, chunk=4)
    y_ref, s_ref = naive_scan(x, dt, A, B, C, D, prev)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(final), s_ref, rtol=1e-3, atol=1e-3)


def test_ssd_chunked_with_carried_state():
    """Split a sequence into two chunked calls == one call."""
    x, dt, A, B, C, D = rand_inputs(T=16, seed=1)
    prev = jnp.zeros((4, 8, 16), jnp.float32)
    y_full, s_full = ssd_chunked(x, dt, A, B, C, D, prev, chunk=4)
    y1, s1 = ssd_chunked(x[:7], dt[:7], A, B[:7], C[:7], D, prev, chunk=4)
    y2, s2 = ssd_chunked(x[7:], dt[7:], A, B[7:], C[7:], D, s1, chunk=4)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2])),
                               np.asarray(y_full), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_full),
                               rtol=1e-3, atol=1e-3)


def test_ssd_decode_step_matches_chunked_tail():
    x, dt, A, B, C, D = rand_inputs(T=9, seed=2)
    prev = jnp.zeros((4, 8, 16), jnp.float32)
    y_full, s_full = ssd_chunked(x, dt, A, B, C, D, prev, chunk=4)
    # first 8 via chunked, last token via decode step
    y8, s8 = ssd_chunked(x[:8], dt[:8], A, B[:8], C[:8], D, prev, chunk=4)
    y9, s9 = ssd_decode_step(x[8:9], dt[8:9], A, B[8:9], C[8:9], D, s8[None])
    np.testing.assert_allclose(np.asarray(y9[0]), np.asarray(y_full[8]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s9[0]), np.asarray(s_full),
                               rtol=1e-3, atol=1e-3)


def test_conv_chunk_and_step_consistent():
    r = np.random.RandomState(3)
    Cdim, K, T = 6, 4, 10
    x = jnp.asarray(r.randn(T, Cdim).astype(np.float32))
    w = jnp.asarray(r.randn(K, Cdim).astype(np.float32))
    b = jnp.asarray(r.randn(Cdim).astype(np.float32))
    hist = jnp.zeros((K - 1, Cdim), jnp.float32)
    out_full, h_full = causal_conv1d_chunk(x, w, b, hist)
    out1, h1 = causal_conv1d_chunk(x[:6], w, b, hist)
    outs = [out1]
    h = h1
    for t in range(6, T):
        o, h = causal_conv1d_step(x[t:t + 1], w, b, h[None])
        outs.append(o)
        h = h[0]
    got = jnp.concatenate(outs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out_full),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_full),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- model ------
def _hf_setup():
    torch = pytest.importorskip("torch")
    import transformers
    hf_cfg = transformers.Mamba2Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2, state_size=16,
        num_heads=4, head_dim=32, expand=2, conv_kernel=4, n_groups=2,
        chunk_size=8, tie_word_embeddings=True, use_conv_bias=True,
        use_bias=False)
    torch.manual_seed(0)
    hf = transformers.Mamba2ForCausalLM(hf_cfg)
    hf.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.models import get_model_class
    cfg = ModelConfig.from_hf_config(hf_cfg)
    assert cfg.architecture == "Mamba2ForCausalLM"
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))
    return hf, cfg, model, params


def test_mamba2_hf_prefill_parity():
    torch = pytest.importorskip("torch")
    hf, cfg, model, params = _hf_setup()
    prompt = list(np.random.RandomState(0).randint(1, 127, 12))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt])).logits[0, -1].numpy()

    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams

    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers, 1, 8,
                        num_blocks=32, max_slots=16)
    eng = ModelEngine(model, params, kv, max_seq_len=64, decode_buckets=(4,),
                      prefill_buckets=(16,))
    req = LlmRequest(prompt, SamplingParams(max_tokens=1))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    ours = np.asarray(
        eng.run_prefill(eng.prepare_prefill_inputs(req, len(prompt)))[0],
        np.float32)
    assert np.argmax(ours) == np.argmax(hf_logits)
    assert np.corrcoef(ours, hf_logits)[0, 1] > 0.99


def test_mamba2_e2e_greedy_and_chunked_prefill():
    """Full LLM API: greedy decode vs HF generate; chunked == unchunked."""
    torch = pytest.importorskip("torch")
    hf, cfg, model, params = _hf_setup()
    prompt = list(np.random.RandomState(1).randint(1, 127, 20))
    n_new = 6
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor([prompt]), max_new_tokens=n_new,
                             do_sample=False)
    hf_toks = hf_out[0, len(prompt):].tolist()

    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams

    def run(chunks):
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers, 1, 8,
                            num_blocks=64, max_slots=16)
        eng = ModelEngine(model, params, kv, max_seq_len=64,
                          decode_buckets=(4,), prefill_buckets=(8, 32))
        req = LlmRequest(list(prompt), SamplingParams(max_tokens=n_new))
        kv.add_sequence(req.request_id, prompt)
        req.start_context()
        logits = None
        for c in chunks:
            start = req.context_position
            kv.grow_sequence(req.request_id, start + c)
            logits = eng.run_prefill(eng.prepare_prefill_inputs(req, c))
            req.context_position += c
        req.finish_context()
        toks = [int(np.argmax(np.asarray(logits[0])))]
        req.append_token(toks[-1])
        for _ in range(n_new - 1):
            kv.grow_sequence(req.request_id, req.num_tokens)
            logits = eng.run_decode(eng.prepare_decode_inputs([req]))
            tok = int(np.argmax(np.asarray(logits[0])))
            toks.append(tok)
            req.append_token(tok)
        return toks

    got = run([20])
    assert got == hf_toks, (got, hf_toks)
    got_chunked = run([8, 8, 4])
    assert got_chunked == hf_toks, (got_chunked, hf_toks)
