"""BERT-class encoders: embeddings and sequence classification (reranking).

Counterpart of the reference's `_torch/models/modeling_bert.py`
(`BertForSequenceClassification`): a classic post-norm bidirectional
encoder — learned position + token-type embeddings with LayerNorm, blocks
of (attention -> add&LN -> gelu FFN -> add&LN), a tanh pooler over the
[CLS] token — serving embedding extraction (`encode`) and classifier
scoring.  Encoders run a single full-sequence forward with no KV cache, so
they bypass the autoregressive executor entirely (`LLM.encode`)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)


def _ln(x, w, b, eps=1e-12):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


@register_auto_model("BertModel", "BertForSequenceClassification")
class BertForSequenceClassification:
    """Encoder-only; `is_encoder` routes LLM() to the encoder runner."""

    is_encoder = True

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.eps = cfg.extra.get("layer_norm_eps", 1e-12)
        self.num_labels = cfg.extra.get("num_labels", 2)
        self.type_vocab = cfg.extra.get("type_vocab_size", 2)

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        cfg = self.cfg
        H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        ks = iter(jax.random.split(key, 6 * cfg.num_layers + 8))
        std = 0.02

        def mat(i, o):
            return (jax.random.normal(next(ks), (i, o), jnp.float32)
                    * std).astype(cfg.dtype)

        def ln():
            return {"w": jnp.ones((H,), jnp.float32),
                    "b": jnp.zeros((H,), jnp.float32)}

        p = {
            "word_emb": (jax.random.normal(next(ks), (V, H), jnp.float32)
                         * std).astype(cfg.dtype),
            "pos_emb": (jax.random.normal(
                next(ks), (cfg.max_position, H), jnp.float32)
                * std).astype(cfg.dtype),
            "type_emb": (jax.random.normal(
                next(ks), (self.type_vocab, H), jnp.float32)
                * std).astype(cfg.dtype),
            "emb_ln": ln(),
            "layers": [],
            "pooler": (mat(H, H), jnp.zeros((H,), jnp.float32)),
            "classifier": (mat(H, self.num_labels),
                           jnp.zeros((self.num_labels,), jnp.float32)),
        }
        for _ in range(cfg.num_layers):
            p["layers"].append({
                "q": (mat(H, H), jnp.zeros((H,), jnp.float32)),
                "k": (mat(H, H), jnp.zeros((H,), jnp.float32)),
                "v": (mat(H, H), jnp.zeros((H,), jnp.float32)),
                "attn_out": (mat(H, H), jnp.zeros((H,), jnp.float32)),
                "attn_ln": ln(),
                "fc1": (mat(H, I), jnp.zeros((I,), jnp.float32)),
                "fc2": (mat(I, H), jnp.zeros((H,), jnp.float32)),
                "out_ln": ln(),
            })
        return p

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        cfg = self.cfg

        def arr(name):
            for pre in ("", "bert."):
                a = get_tensor(pre + name)
                if a is not None:
                    return jnp.asarray(np.asarray(a)).astype(jnp.float32)
            return None

        def lin(name):
            return (arr(name + ".weight").T.astype(cfg.dtype),
                    arr(name + ".bias"))

        def ln(name):
            return {"w": arr(name + ".weight"), "b": arr(name + ".bias")}

        p = {
            "word_emb": arr("embeddings.word_embeddings.weight"
                            ).astype(cfg.dtype),
            "pos_emb": arr("embeddings.position_embeddings.weight"
                           ).astype(cfg.dtype),
            "type_emb": arr("embeddings.token_type_embeddings.weight"
                            ).astype(cfg.dtype),
            "emb_ln": ln("embeddings.LayerNorm"),
            "layers": [],
        }
        for i in range(cfg.num_layers):
            pre = f"encoder.layer.{i}."
            p["layers"].append({
                "q": lin(pre + "attention.self.query"),
                "k": lin(pre + "attention.self.key"),
                "v": lin(pre + "attention.self.value"),
                "attn_out": lin(pre + "attention.output.dense"),
                "attn_ln": ln(pre + "attention.output.LayerNorm"),
                "fc1": lin(pre + "intermediate.dense"),
                "fc2": lin(pre + "output.dense"),
                "out_ln": ln(pre + "output.LayerNorm"),
            })
        pooler = arr("pooler.dense.weight")
        if pooler is not None:
            p["pooler"] = (pooler.T.astype(cfg.dtype),
                           arr("pooler.dense.bias"))
        clf = arr("classifier.weight")
        if clf is not None:
            p["classifier"] = (clf.T.astype(cfg.dtype),
                               arr("classifier.bias"))
        return p

    # ---- forward ----------------------------------------------------------------
    def encode(self, params: Dict, token_ids: jax.Array,
               attn_mask: Optional[jax.Array] = None) -> jax.Array:
        """[B, T] ids -> [B, T, H] final hidden states (bidirectional)."""
        cfg = self.cfg
        B, T = token_ids.shape
        H = cfg.hidden_size
        nH = cfg.num_heads
        D = H // nH
        x = params["word_emb"][token_ids] \
            + params["pos_emb"][jnp.arange(T)][None] \
            + params["type_emb"][0][None, None]
        x = _ln(x, params["emb_ln"]["w"], params["emb_ln"]["b"], self.eps)
        if attn_mask is None:
            attn_mask = jnp.ones((B, T), bool)
        bias = jnp.where(attn_mask[:, None, None, :], 0.0, -1e30)
        for lp in params["layers"]:
            q = (jnp.dot(x, lp["q"][0]) + lp["q"][1].astype(x.dtype)
                 ).reshape(B, T, nH, D)
            k = (jnp.dot(x, lp["k"][0]) + lp["k"][1].astype(x.dtype)
                 ).reshape(B, T, nH, D)
            v = (jnp.dot(x, lp["v"][0]) + lp["v"][1].astype(x.dtype)
                 ).reshape(B, T, nH, D)
            sc = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * D ** -0.5
            pr = jax.nn.softmax(sc + bias, axis=-1)
            att = jnp.einsum("bhij,bjhd->bihd", pr, v.astype(jnp.float32))
            att = att.reshape(B, T, H).astype(x.dtype)
            a = jnp.dot(att, lp["attn_out"][0]) \
                + lp["attn_out"][1].astype(x.dtype)
            x = _ln(x + a, lp["attn_ln"]["w"], lp["attn_ln"]["b"], self.eps)
            hmid = jnp.dot(x, lp["fc1"][0]) + lp["fc1"][1].astype(x.dtype)
            hmid = jax.nn.gelu(hmid.astype(jnp.float32),
                               approximate=False).astype(x.dtype)
            f = jnp.dot(hmid, lp["fc2"][0]) + lp["fc2"][1].astype(x.dtype)
            x = _ln(x + f, lp["out_ln"]["w"], lp["out_ln"]["b"], self.eps)
        return x

    def pool(self, params: Dict, hidden: jax.Array) -> jax.Array:
        """Tanh pooler over the [CLS] token -> [B, H]."""
        cls = hidden[:, 0]
        w, b = params["pooler"]
        return jnp.tanh(jnp.dot(cls, w).astype(jnp.float32)
                        + b).astype(hidden.dtype)

    def classify(self, params: Dict, token_ids, attn_mask=None) -> jax.Array:
        """Sequence-classification logits [B, num_labels] (reranking)."""
        pooled = self.pool(params, self.encode(params, token_ids, attn_mask))
        w, b = params["classifier"]
        return jnp.dot(pooled, w).astype(jnp.float32) + b


class EncoderRunner:
    """Minimal serving runner for encoder models: jitted batched encode
    with length bucketing (the encoder analog of the decode engine)."""

    def __init__(self, model, params, max_seq_len: int = 512,
                 buckets=(32, 128, 512)):
        self.model = model
        self.params = params
        self.buckets = tuple(b for b in buckets if b <= max_seq_len) \
            or (max_seq_len,)
        self._fns = {}

    def _fn(self, kind: str):
        if kind not in self._fns:
            if kind == "encode":
                self._fns[kind] = jax.jit(
                    lambda p, ids, m: self.model.encode(p, ids, m))
            else:
                self._fns[kind] = jax.jit(
                    lambda p, ids, m: self.model.classify(p, ids, m))
        return self._fns[kind]

    def _pad(self, batch_ids: List[List[int]]):
        L = max(len(t) for t in batch_ids)
        Lp = next((b for b in self.buckets if b >= L), self.buckets[-1])
        ids = np.zeros((len(batch_ids), Lp), np.int32)
        mask = np.zeros((len(batch_ids), Lp), bool)
        for i, t in enumerate(batch_ids):
            ids[i, :len(t)] = t[:Lp]
            mask[i, :len(t)] = True
        return jnp.asarray(ids), jnp.asarray(mask), mask

    def embed(self, batch_ids: List[List[int]], pooling: str = "cls"
              ) -> np.ndarray:
        """[B] token lists -> [B, H] embeddings (cls | mean pooling)."""
        ids, mask, np_mask = self._pad(batch_ids)
        hidden = np.asarray(self._fn("encode")(self.params, ids, mask),
                            np.float32)
        if pooling == "mean":
            denom = np_mask.sum(1, keepdims=True).clip(1)
            return (hidden * np_mask[..., None]).sum(1) / denom
        return hidden[:, 0]

    def score(self, batch_ids: List[List[int]]) -> np.ndarray:
        """Classifier logits [B, num_labels] (reranker scores)."""
        ids, mask, _ = self._pad(batch_ids)
        return np.asarray(self._fn("classify")(self.params, ids, mask),
                          np.float32)
