"""Raw-image preprocessing parity with HF processors (bicubic, antialiased).

Round-1 weakness: nearest-neighbor index sampling diverged from the HF
processors' PIL bicubic path on real images."""

import numpy as np
import pytest

from tensorrt_llm_tpu.inputs import (CLIP_MEAN, CLIP_STD, _resize_bicubic,
                                     preprocess_images)


class VisionStub:
    image_size = 32
    num_channels = 3


def _img(seed=0, h=97, w=123):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8)


def test_matches_hf_processor_exactly():
    """Our raw-image path must reproduce a plain-resize HF processor
    (Blip-style: direct bicubic to SxS + rescale + normalize) bit-for-bit —
    both route through PIL bicubic."""
    tr = pytest.importorskip("transformers")
    proc = tr.BlipImageProcessor(
        size={"height": 32, "width": 32},
        image_mean=CLIP_MEAN.tolist(), image_std=CLIP_STD.tolist())
    img = _img()
    ref = proc(img, return_tensors="np")["pixel_values"][0]  # [C, S, S]
    ours = preprocess_images([img], VisionStub())[0]
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_preprocessed_arrays_pass_through():
    chw = np.random.RandomState(1).randn(3, 32, 32).astype(np.float32)
    out = preprocess_images([chw], VisionStub())[0]
    np.testing.assert_array_equal(out, chw)


def test_numpy_fallback_close_to_pil(monkeypatch):
    """The no-PIL cubic filter stays within ~1.5/255 of PIL bicubic."""
    img = _img(2)
    pil = _resize_bicubic(img, 32)

    import builtins
    real_import = builtins.__import__

    def fake(name, *a, **k):
        if name == "PIL" or name.startswith("PIL."):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake)
    fallback = _resize_bicubic(img, 32)
    assert np.abs(pil - fallback).mean() < 1.5 / 255
    assert np.abs(pil - fallback).max() < 12 / 255
