"""Batched token sampler.

Counterpart of the reference's `TorchSampler` (`pyexecutor/sampler.py`, C++
sampling layers `dynamicDecodeLayer.cpp`): greedy / temperature / top-k /
top-p / min-p, vectorized over the batch as one jitted device computation,
with per-request parameters passed as arrays (so one compiled sampler serves
every batch mix — the analog of the reference's batched sampling kernels).

Penalties (repetition/presence/frequency) are applied on the logits from a
[B, V] count matrix maintained incrementally by the executor.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import ClassVar, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams

NEG_INF = float(np.finfo(np.float32).min)


@jax.tree_util.register_dataclass
@dataclass
class SamplingState:
    """Per-batch-row sampling parameters (device arrays, [B])."""

    temperature: jax.Array
    top_k: jax.Array
    top_p: jax.Array
    min_p: jax.Array
    greedy: jax.Array        # bool
    seeds: jax.Array         # uint32 per row

    _cache: ClassVar[dict] = {}

    @staticmethod
    def from_params(params: List[SamplingParams], step: int,
                    pad_to: int = 0) -> "SamplingState":
        """Build the batched state, padded to `pad_to` rows (greedy padding)
        so one compiled sampler serves each logits bucket.

        The step-independent rows are cached per batch composition (the
        executor rebuilds the state every dispatch; only the per-step seed
        fold changes), so steady-state decode pays one small host->device
        transfer instead of six."""
        key = (tuple((p.temperature, p.top_k, p.top_p, p.min_p, p.greedy,
                      p.seed) for p in params), pad_to)
        ent = SamplingState._cache.get(key)
        if ent is not None:
            # LRU refresh: steady-state compositions must not be evicted
            # by churn (dict order is insertion order)
            del SamplingState._cache[key]
            SamplingState._cache[key] = ent
        if ent is None:
            n_pad = max(pad_to - len(params), 0)
            temp = np.array([max(p.temperature, 1e-5) for p in params]
                            + [1.0] * n_pad, np.float32)
            topk = np.array([p.top_k if p.top_k > 0 else 0 for p in params]
                            + [0] * n_pad, np.int32)
            topp = np.array([p.top_p for p in params] + [1.0] * n_pad,
                            np.float32)
            minp = np.array([p.min_p for p in params] + [0.0] * n_pad,
                            np.float32)
            greedy = np.array([p.greedy for p in params] + [True] * n_pad,
                              bool)
            base = np.array(
                [(p.seed if p.seed is not None else 0x9E3779B9 + i)
                 & 0xFFFFFFFF
                 for i, p in enumerate(params)] + [0] * n_pad, np.uint32)
            ent = (jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp),
                   jnp.asarray(minp), jnp.asarray(greedy), base)
            if len(SamplingState._cache) >= 256:
                SamplingState._cache.pop(next(iter(SamplingState._cache)))
            SamplingState._cache[key] = ent
        temp_d, topk_d, topp_d, minp_d, greedy_d, base = ent
        seeds = base ^ np.uint32((step * 2654435761) & 0xFFFFFFFF)
        return SamplingState(
            temperature=temp_d, top_k=topk_d, top_p=topp_d, min_p=minp_d,
            greedy=greedy_d, seeds=jnp.asarray(seeds))


@functools.partial(jax.jit, static_argnames=("max_top_k",))
def sample_tokens(
    logits: jax.Array,       # [B, V] f32
    state: SamplingState,
    max_top_k: int = 64,
    step_offset=0,           # extra PRNG fold (multi-step fused decode)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (token_ids [B], logprobs_of_chosen [B])."""
    B, V = logits.shape
    scaled = logits / state.temperature[:, None]

    # top-k mask (bucketed at max_top_k for static shapes)
    if max_top_k > 0:
        # per-row k: value of the k-th largest via sorted slice
        topv = jax.lax.top_k(scaled, max_top_k)[0]          # [B, max_top_k]
        k_idx = jnp.clip(state.top_k - 1, 0, max_top_k - 1)
        kth_val = jnp.take_along_axis(topv, k_idx[:, None], axis=1)
        use_topk = (state.top_k > 0)[:, None]
        scaled = jnp.where(use_topk & (scaled < kth_val), NEG_INF, scaled)

    # top-p (nucleus): mask tokens beyond cumulative prob p
    probs = jax.nn.softmax(scaled, axis=-1)
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = cum - sorted_probs < state.top_p[:, None]
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(B)[:, None], sort_idx].set(keep_sorted)
    scaled = jnp.where(keep, scaled, NEG_INF)

    # min-p
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    scaled = jnp.where(probs < state.min_p[:, None] * pmax, NEG_INF, scaled)

    # gumbel-max sampling (counter-based per-row PRNG)
    base = jax.random.PRNGKey(0)
    seeds = state.seeds + jnp.uint32(step_offset) * jnp.uint32(2654435761)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(base, seeds)
    gumbel = jax.vmap(lambda k: jax.random.gumbel(k, (V,), jnp.float32))(keys)
    sampled = jnp.argmax(scaled + gumbel, axis=-1)
    greedy_tok = jnp.argmax(logits, axis=-1)
    tokens = jnp.where(state.greedy, greedy_tok, sampled).astype(jnp.int32)

    logp = jax.nn.log_softmax(logits, axis=-1)
    chosen_logp = jnp.take_along_axis(logp, tokens[:, None], axis=1)[:, 0]
    return tokens, chosen_logp


@jax.jit
def apply_penalties(
    logits: jax.Array,        # [B, V]
    token_counts: jax.Array,  # [B, V] int32 counts of tokens in each sequence
    repetition: jax.Array,    # [B]
    presence: jax.Array,      # [B]
    frequency: jax.Array,     # [B]
) -> jax.Array:
    seen = token_counts > 0
    rep = repetition[:, None]
    logits = jnp.where(
        seen & (logits > 0), logits / rep,
        jnp.where(seen, logits * rep, logits))
    logits = logits - presence[:, None] * seen.astype(jnp.float32)
    logits = logits - frequency[:, None] * token_counts.astype(jnp.float32)
    return logits


@functools.partial(jax.jit, static_argnames=("n",))
def top_n_logprobs(logits: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
    """Top-n (logprob, token) per row for SamplingParams.logprobs."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(logp, n)
    return vals, idx
