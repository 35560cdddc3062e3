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


def test_dora_magnitude_merge(tmp_path):
    """DoRA adapters (PEFT use_dora=True): merged weight is
    m * (W0 + s*BA) / ||W0 + s*BA||_row (reference norm_dora_magnitude,
    lora_manager.py:233)."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from tensorrt_llm_tpu.lora import load_lora_adapter, merge_lora_into_state

    rng = np.random.RandomState(0)
    out_f, in_f, r = 8, 6, 2
    A = rng.randn(r, in_f).astype(np.float32)
    B = rng.randn(out_f, r).astype(np.float32)
    mag = np.abs(rng.randn(out_f)).astype(np.float32) + 0.5
    mod = "model.layers.0.self_attn.q_proj"
    d = tmp_path / "dora"
    d.mkdir()
    (d / "adapter_config.json").write_text(json.dumps(
        {"r": r, "lora_alpha": 4, "use_dora": True}))
    save_file({
        f"base_model.model.{mod}.lora_A.weight": A,
        f"base_model.model.{mod}.lora_B.weight": B,
        f"base_model.model.{mod}.lora_magnitude_vector": mag,
    }, str(d / "adapter_model.safetensors"))

    adapter = load_lora_adapter(str(d))
    assert adapter.is_dora

    W0 = rng.randn(out_f, in_f).astype(np.float32)
    reader = merge_lora_into_state(
        lambda n: W0 if n == mod + ".weight" else None, adapter)
    got = reader(mod + ".weight")
    V = W0 + (4 / r) * (B @ A)
    want = mag[:, None] * V / np.linalg.norm(V, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # untargeted weights pass through untouched
    other = reader("model.layers.1.mlp.up_proj.weight")
    assert other is None


def test_multi_lora_rejects_dora(tmp_path):
    import json

    import numpy as np
    import pytest
    from safetensors.numpy import save_file

    from tensorrt_llm_tpu.lora.multi_lora import MultiLoraManager

    d = tmp_path / "dora2"
    d.mkdir()
    (d / "adapter_config.json").write_text(json.dumps(
        {"r": 2, "lora_alpha": 2, "use_dora": True}))
    mod = "model.layers.0.self_attn.q_proj"
    save_file({
        f"base_model.model.{mod}.lora_A.weight": np.zeros((2, 4), np.float32),
        f"base_model.model.{mod}.lora_B.weight": np.zeros((4, 2), np.float32),
        f"base_model.model.{mod}.lora_magnitude_vector":
            np.ones(4, np.float32),
    }, str(d / "adapter_model.safetensors"))
    with pytest.raises(AssertionError, match="DoRA"):
        MultiLoraManager.from_paths({"a": str(d)}, None)
