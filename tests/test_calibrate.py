"""Clip-search quantization calibration (quantization/calibrate.py —
reference calibration-flow capability, quantize_by_modelopt.py:114)."""

import numpy as np
import pytest

from tensorrt_llm_tpu.quantization import quantize_w4
from tensorrt_llm_tpu.quantization.calibrate import (quantize_w4_calibrated,
                                                     weight_mse)


def heavy_tailed(seed=0, K=256, N=128):
    rng = np.random.RandomState(seed)
    w = rng.randn(K, N).astype(np.float32) * 0.05
    # outliers: ~0.5% of entries 10x larger — the case absmax RTN wastes
    # the int4 grid on
    mask = rng.rand(K, N) < 0.005
    w[mask] *= 10.0
    return w


@pytest.mark.parametrize("symmetric,gain", [(True, 0.9), (False, 0.99)])
def test_clip_search_beats_rtn_on_outliers(symmetric, gain):
    # asymmetric RTN already absorbs one-sided outliers via the zero
    # point, so its calibration headroom is smaller
    w = heavy_tailed()
    q0, s0, z0 = quantize_w4(w, 64, symmetric=symmetric)
    q1, s1, z1 = quantize_w4_calibrated(w, 64, symmetric=symmetric)
    mse_rtn = weight_mse(w, q0, s0, z0, 64)
    mse_cal = weight_mse(w, q1, s1, z1, 64)
    assert mse_cal < mse_rtn * gain, (mse_cal, mse_rtn)


def test_clip_search_matches_rtn_on_uniform_weights():
    """Without outliers, r=1.0 is (near) optimal — calibration must never
    be much worse than RTN."""
    w = np.random.RandomState(1).randn(256, 128).astype(np.float32) * 0.05
    q0, s0, _ = quantize_w4(w, 64, True)
    q1, s1, _ = quantize_w4_calibrated(w, 64, True)
    assert weight_mse(w, q1, s1, None, 64) <= \
        weight_mse(w, q0, s0, None, 64) * 1.0001


def test_activation_weighted_calibration_prioritizes_hot_channels():
    """Channels with large activation scales get better reconstruction."""
    w = heavy_tailed(2)
    K = w.shape[0]
    act = np.ones(K, np.float32)
    hot = slice(0, 64)
    act[hot] = 50.0
    q, s, _ = quantize_w4_calibrated(w, 64, True, act_scales=act)
    qb, sb, _ = quantize_w4_calibrated(w, 64, True)

    def chan_err(q_, s_):
        G = 64
        qg = np.asarray(q_, np.float32).reshape(K // G, G, -1)
        deq = (qg * np.asarray(s_)[:, None, :]).reshape(K, -1)
        return np.square(w - deq)[hot].mean()

    assert chan_err(q, s) <= chan_err(qb, sb) + 1e-9


def test_llm_api_clip_search_end_to_end():
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    cfg = ModelConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      max_position=128)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=2, kv_num_blocks=32, kv_block_size=8,
                   quant_algo="W4A16", quant_clip_search=True)
    out = llm.generate([[1, 2, 3]], tllm.SamplingParams(max_tokens=4,
                                                        ignore_eos=True))
    assert len(out[0].outputs[0].token_ids) == 4
    llm.shutdown()
