"""LoRA adapter loading + merge tests."""

import json

import numpy as np
import pytest

from tensorrt_llm_tpu.lora import LoraAdapter, load_lora_adapter, merge_lora_into_state


def make_adapter_dir(tmp_path, rank=4, alpha=8.0):
    from safetensors.numpy import save_file
    rng = np.random.RandomState(0)
    mod = "model.layers.0.self_attn.q_proj"
    A = rng.randn(rank, 16).astype(np.float32)
    B = rng.randn(32, rank).astype(np.float32)
    save_file({
        f"base_model.model.{mod}.lora_A.weight": A,
        f"base_model.model.{mod}.lora_B.weight": B,
    }, str(tmp_path / "adapter_model.safetensors"))
    (tmp_path / "adapter_config.json").write_text(json.dumps(
        {"r": rank, "lora_alpha": alpha, "target_modules": ["q_proj"]}))
    return mod, A, B


def test_load_and_merge(tmp_path):
    mod, A, B = make_adapter_dir(tmp_path)
    adapter = load_lora_adapter(str(tmp_path))
    assert adapter.rank == 4 and adapter.scaling == 2.0
    assert mod in adapter.weights

    base = {f"{mod}.weight": np.ones((32, 16), np.float32),
            "other.weight": np.zeros((4, 4), np.float32)}
    reader = merge_lora_into_state(base.get, adapter)
    merged = reader(f"{mod}.weight")
    np.testing.assert_allclose(merged, 1.0 + 2.0 * (B @ A), rtol=1e-5)
    np.testing.assert_allclose(reader("other.weight"), 0.0)
    assert reader("missing.weight") is None
