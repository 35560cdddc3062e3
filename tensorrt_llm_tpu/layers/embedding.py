"""Token embedding + LM head.

Counterpart of the reference's `_torch/modules/embedding.py`.  The embedding
table can be vocab-sharded over "tp" (each rank holds a vocab slice, gathers
via masked lookup + psum) or replicated.  The LM head is a column-parallel
Linear over the vocab dim with an all-gather of logits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.parallel.ops import TP_AXES, tp_all_reduce


@dataclass
class Embedding:
    vocab_size: int
    hidden_size: int
    dtype: jnp.dtype = jnp.bfloat16
    tp_size: int = 1
    vocab_sharded: bool = False  # shard vocab dim over tp

    def init(self, key) -> Dict[str, jax.Array]:
        v = self.vocab_size // (self.tp_size if self.vocab_sharded else 1)
        return {"weight": jax.random.normal(key, (v, self.hidden_size),
                                            jnp.float32).astype(self.dtype) * 0.02}

    def from_float(self, w: jax.Array) -> Dict[str, jax.Array]:
        return {"weight": w.astype(self.dtype)}

    def param_specs(self) -> Dict[str, P]:
        if self.vocab_sharded and self.tp_size > 1:
            return {"weight": P(TP_AXES, None)}
        return {"weight": P(None, None)}

    def __call__(self, params, token_ids: jax.Array) -> jax.Array:
        w = params["weight"]
        if self.vocab_sharded and self.tp_size > 1:
            per_rank = self.vocab_size // self.tp_size
            rank = jax.lax.axis_index(TP_AXES)
            local = token_ids - rank * per_rank
            in_range = (local >= 0) & (local < per_rank)
            local = jnp.clip(local, 0, per_rank - 1)
            emb = w[local] * in_range[..., None].astype(w.dtype)
            return tp_all_reduce(emb)
        return w[token_ids]
