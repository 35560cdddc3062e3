"""Quantized-expert MoE under EP x TP sharding on the virtual CPU mesh.

The int4 packing must survive the sharding cuts (tp on gate_up output tiles,
tp on down's K rows, ep on the expert dim) — the property the reference gets
from per-rank preprocessing (cutlass_preprocessors) and we get from the
K-pair/tile layout (quantization/quantize.py module docstring).
"""

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.quantization import QuantAlgo, QuantConfig
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheConfig, KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest

from test_moe import MOE_TINY, random_hf_moe_sd


@pytest.mark.parametrize("ep,tp", [(2, 1), (1, 2), (2, 2)])
def test_quant_moe_ep_tp_matches_single_device(ep, tp):
    if len(jax.devices()) < ep * tp:
        pytest.skip("not enough devices")
    sd = random_hf_moe_sd(0)
    quant = QuantConfig(quant_algo=QuantAlgo.W4A16, group_size=32,
                        exclude_modules=("lm_head", "embed", "attn", "mlp."))
    # exclude dense Linears ('mlp.' catches the shared GatedMLP path) so the
    # only quantized tensors are the grouped experts under test

    def engine_for(mapping):
        cfg = ModelConfig(**MOE_TINY, architecture="Qwen3MoeForCausalLM",
                          mapping=mapping, quant=quant)
        model = get_model_class(cfg.architecture)(cfg)
        params = model.load_hf_weights(sd.get)
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim, num_blocks=32)
        return ModelEngine(model, params, kv, mapping=mapping,
                           max_seq_len=64, decode_buckets=(4,),
                           prefill_buckets=(16,)), kv

    def run(engine, kv):
        req = LlmRequest([1, 2, 3, 4, 5, 6, 7, 8],
                         SamplingParams(max_tokens=2))
        kv.add_sequence(req.request_id, req.prompt_token_ids)
        req.start_context()
        kv.grow_sequence(req.request_id, req.prompt_len)
        logits = engine.run_prefill(engine.prepare_prefill_inputs(req, 8))
        return np.asarray(logits[0], np.float32)

    e1, kv1 = engine_for(Mapping())
    ref = run(e1, kv1)
    etp, kvtp = engine_for(Mapping(tp_size=ep * tp, moe_ep_size=ep,
                                   moe_tp_size=tp))
    got = run(etp, kvtp)
    np.testing.assert_allclose(ref, got, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("factor", [None, 2.0])
def test_ep_dispatch_excludes_remote_rows(factor):
    """EP dispatch: remote pairs never enter the grouped GEMMs, and a
    generous capacity factor keeps outputs exact."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    sd = random_hf_moe_sd(1)

    def engine_for(mapping, cf):
        cfg = ModelConfig(**MOE_TINY, architecture="Qwen3MoeForCausalLM",
                          mapping=mapping, moe_capacity_factor=cf)
        model = get_model_class(cfg.architecture)(cfg)
        params = model.load_hf_weights(sd.get)
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim, num_blocks=32)
        return ModelEngine(model, params, kv, mapping=mapping,
                           max_seq_len=64, decode_buckets=(4,),
                           prefill_buckets=(16,)), kv

    def run(engine, kv):
        req = LlmRequest([3, 1, 4, 1, 5, 9, 2, 6],
                         SamplingParams(max_tokens=2))
        kv.add_sequence(req.request_id, req.prompt_token_ids)
        req.start_context()
        kv.grow_sequence(req.request_id, req.prompt_len)
        logits = engine.run_prefill(engine.prepare_prefill_inputs(req, 8))
        return np.asarray(logits[0], np.float32)

    e1, kv1 = engine_for(Mapping(), None)
    ref = run(e1, kv1)
    # capacity 2.0x the balanced share: dropless in practice for tiny E
    eep, kvep = engine_for(Mapping(tp_size=2, moe_ep_size=2), factor)
    got = run(eep, kvep)
    np.testing.assert_allclose(ref, got, rtol=3e-2, atol=3e-2)


def test_moe_capacity_drops_overflow_rows():
    """A tiny capacity drops (token, expert) pairs but stays finite and
    close-ish (dropped experts only lose their weighted contribution)."""
    from tensorrt_llm_tpu.layers.moe import MoE
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devs, ("ep", "tp"))
    moe = MoE(hidden_size=64, intermediate_size=64, num_experts=4, top_k=2,
              ep_size=2, capacity_factor=0.25)
    params = moe.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 64), jnp.bfloat16)

    def fwd(p, x):
        return moe(p, x)

    specs = jax.tree.map(lambda _: P(), params)
    specs["w_gate_up"] = P("ep", None, None)
    specs["w_down"] = P("ep", None, None)
    specs["router"] = P(None, None)
    specs.pop("expert_map", None)
    params.pop("expert_map", None)
    f = shard_map(fwd, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
                  check_rep=False)
    out = np.asarray(f(params, x), np.float32)
    assert np.isfinite(out).all()


def test_moe_capacity_is_per_expert_not_tail_truncation():
    """Overflow must drop each expert's LATEST rows, not everything routed
    to high-index slots: with all tokens on rank 1's experts {2,3}, a flat
    tail cut kept only expert-2 rows and starved expert 3 entirely."""
    from tensorrt_llm_tpu.layers.moe import MoE
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devs, ("ep", "tp"))

    def run(cf):
        moe = MoE(hidden_size=64, intermediate_size=64, num_experts=4,
                  top_k=2, ep_size=2, capacity_factor=cf)
        params = moe.init(jax.random.PRNGKey(0))
        router = np.zeros((64, 4), np.float32)
        router[:, 2] = 1.0   # every token picks experts 2 then 3
        router[:, 3] = 0.5
        params["router"] = jnp.asarray(router)
        params.pop("expert_map", None)
        specs = jax.tree.map(lambda _: P(), params)
        specs["w_gate_up"] = P("ep", None, None)
        specs["w_down"] = P("ep", None, None)
        x = jnp.ones((16, 64), jnp.bfloat16) * 0.05  # identical tokens
        f = shard_map(lambda p, xx: moe(p, xx), mesh=mesh,
                      in_specs=(specs, P()), out_specs=P(),
                      check_rep=False)
        return np.asarray(f(params, x), np.float32)

    full = run(None)           # dropless: every row = w2*f2 + w3*f3
    # Ce = ceil(0.5*32/4) = 4: experts 2 AND 3 each keep their first 4
    # tokens — token 0 keeps BOTH contributions, late tokens drop fully
    tight = run(0.5)
    np.testing.assert_allclose(tight[0], full[0], rtol=2e-2, atol=2e-2)
    assert np.abs(tight[-1]).max() < 1e-6, "late overflow rows must drop"
    # expert 3 must contribute somewhere (old tail cut zeroed it out):
    # a kept-both row differs from pure-expert-2 rows
    assert not np.allclose(tight[0], 0.0)
