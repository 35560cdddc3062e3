"""Phi-4-Multimodal — vision path (reference
`_torch/models/modeling_phi4mm.py`; HF `Phi4MultimodalForCausalLM`):
a Phi-3 language model whose image embedding runs the HD transform —
each image arrives as [global crop; sub-image tiles], all through a
SigLIP tower tapped at hidden-state index `feature_layer` (raw, no
post-LN), 2x2 avg-pool token compression, sub tiles re-assembled into
the full-resolution grid with a learned newline column per row, then
``[sub; global-separator token; global]`` through the
up -> gelu -> down projection and spliced at the image-token rows.

Round-1 scope: full (unpadded) crops — the common resized-tile path;
the audio conformer branch is a later round."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.phi import Phi3ForCausalLM
from tensorrt_llm_tpu.models.vision.siglip import SiglipVisionTower


@register_auto_model("Phi4MultimodalForCausalLM", "Phi4MMForCausalLM")
class Phi4MultimodalForCausalLM(Phi3ForCausalLM):
    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = vc.get(
            "image_token_id", cfg.extra.get("image_token_id", 200010))
        self.crop_size = vc.get("crop_size", 448)
        self.vision = SiglipVisionTower(
            hidden_size=vc.get("hidden_size", 1152),
            num_layers=vc.get("num_hidden_layers", 27),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4304),
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-6),
            feature_layer=vc.get("feature_layer", -2),
            dtype=cfg.dtype,
        )
        n_patches = self.vision.image_size // self.vision.patch_size
        assert n_patches % 2 == 0, \
            "odd patch grids (reflection pad) land later"
        self.base_feat = n_patches // 2
        self.vdim = self.vision.H
        ac = cfg.extra.get("audio_config") or {}
        self.audio = Phi4AudioEncoder(ac)
        self.audio_token_index = ac.get("audio_token_id", 200011)
        self._audio_params = None
        self._audio_proj = None

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        params["vision"] = self.vision.init(k2)
        H, V = self.cfg.hidden_size, self.vdim
        ka, kb = jax.random.split(k3)
        params["image_embed"] = {
            "up": ((jax.random.normal(ka, (V, H), jnp.float32)
                    * (0.5 / V ** 0.5)).astype(self.cfg.dtype),
                   jnp.zeros((H,), jnp.float32)),
            "down": ((jax.random.normal(kb, (H, H), jnp.float32)
                      * (0.5 / H ** 0.5)).astype(self.cfg.dtype),
                     jnp.zeros((H,), jnp.float32)),
            "global_ext": jnp.zeros((V,), jnp.float32),
            "sub_ext": jnp.zeros((V,), jnp.float32),
        }
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init(jax.random.PRNGKey(0)))
        specs["image_embed"] = {"up": (P(None, None), P(None)),
                                "down": (P(None, None), P(None)),
                                "global_ext": P(None), "sub_ext": P(None)}
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = super().load_hf_weights(get_tensor, dtype=dtype)
        pre = "model.embed_tokens_extend.image_embed."
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, pre + "img_processor.")
        params["image_embed"] = {
            "up": (arr(pre + "img_projection_up.weight").T.astype(
                self.cfg.dtype), arr(pre + "img_projection_up.bias")),
            "down": (arr(pre + "img_projection_down.weight").T.astype(
                self.cfg.dtype), arr(pre + "img_projection_down.bias")),
            "global_ext": arr(pre + "global_img_feature_extensor"
                              ).reshape(-1),
            "sub_ext": arr(pre + "sub_img_feature_extensor").reshape(-1),
        }
        apre = "model.embed_tokens_extend.audio_embed."
        if get_tensor(apre + "encoder.encoder_embedding.global_mean") \
                is not None:
            # audio runs host-side at input-processing time: keep its
            # weights on the model object, outside the engine pytree
            self._audio_params = self.audio.load_hf_weights(
                get_tensor, apre + "encoder.")
            def np_lin(n):
                return (np.asarray(get_tensor(apre + n + ".weight"),
                                   np.float32).T,
                        np.asarray(get_tensor(apre + n + ".bias"),
                                   np.float32))
            self._audio_proj = {
                "speech": (np_lin("up_proj_for_speech"),
                           np_lin("down_proj_for_speech")),
                "vision_speech": (np_lin("up_proj_for_vision_speech"),
                                  np_lin("down_proj_for_vision_speech")),
            }
        return params

    # ---- HD transform -----------------------------------------------------------
    def _embed_image(self, params, crops: np.ndarray,
                     image_size) -> np.ndarray:
        """crops [1+n_sub, 3, S, S] (global first) + original (H, W) ->
        [n_tokens, hidden] projected features."""
        from scipy.special import erf
        bs, V = self.base_feat, self.vdim
        feats = np.asarray(self.vision(
            params["vision"], jnp.asarray(crops)).astype(jnp.float32))
        g = int(round(feats.shape[1] ** 0.5))
        # 2x2 avg-pool token compression
        f = feats.reshape(-1, g // 2, 2, g // 2, 2, V).mean((2, 4))
        f = f.reshape(-1, bs * bs, V)

        hr = int(image_size[0]) // self.crop_size
        wr = int(image_size[1]) // self.crop_size
        sub_ext = np.asarray(params["image_embed"]["sub_ext"], np.float32)
        glob_ext = np.asarray(params["image_embed"]["global_ext"],
                              np.float32)

        def with_newlines(grid):                 # [h, w, V] -> [h*(w+1), V]
            h = grid.shape[0]
            col = np.broadcast_to(sub_ext, (h, 1, V))
            return np.concatenate([grid, col], axis=1).reshape(-1, V)

        glob = with_newlines(f[0].reshape(bs, bs, V))
        sub = f[1:1 + hr * wr].reshape(hr, wr, bs, bs, V)
        sub = sub.transpose(0, 2, 1, 3, 4).reshape(hr * bs, wr * bs, V)
        sub = with_newlines(sub)
        x = np.concatenate([sub, glob_ext[None], glob], axis=0)

        up_w, up_b = params["image_embed"]["up"]
        x = x @ np.asarray(up_w, np.float32) + np.asarray(up_b, np.float32)
        x = x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
        dn_w, dn_b = params["image_embed"]["down"]
        return x @ np.asarray(dn_w, np.float32) + np.asarray(dn_b,
                                                             np.float32)

    def preprocess_images(self, images):
        out = []
        for im in images:
            assert isinstance(im, dict) and "pixel_values" in im, \
                "Phi-4-MM needs {'pixel_values': [1+n_sub, 3, S, S], " \
                "'image_size': (H, W)} dicts"
            out.append({"pixel_values": np.asarray(im["pixel_values"],
                                                   np.float32),
                        "image_size": tuple(im["image_size"])})
        return out

    def _embed_audio(self, features: np.ndarray, mode: str) -> np.ndarray:
        """[T, input_size] features -> [T', hidden] projected tokens."""
        from scipy.special import erf
        if self._audio_params is None:
            self._audio_params = _phi4mm_audio_init(self.audio)
        enc = self.audio(self._audio_params,
                         np.asarray(features, np.float32))
        if self._audio_proj is None:
            rng = np.random.RandomState(23)
            D, H = self.audio.D, self.cfg.hidden_size
            w = (rng.randn(D, H).astype(np.float32) * (0.5 / D ** 0.5),
                 np.zeros(H, np.float32))
            w2 = (rng.randn(H, H).astype(np.float32) * (0.5 / H ** 0.5),
                  np.zeros(H, np.float32))
            self._audio_proj = {"speech": (w, w2), "vision_speech": (w, w2)}
        (uw, ub), (dw, db) = self._audio_proj[mode]
        x = enc @ uw + ub
        x = x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
        return x @ dw + db

    def process_multimodal(self, params, token_ids: List[int], images,
                           audios=()):
        mode = "vision_speech" if (images and audios) else "speech"
        packed_audio = [self._embed_audio(a, mode) for a in audios]
        packed = [self._embed_image(params, im["pixel_values"],
                                    im["image_size"]) for im in images]
        expanded: List[int] = []
        slots = []
        img = aud = 0
        for t in token_ids:
            if t == self.image_token_index:
                slots.append(("i", len(expanded), packed[img].shape[0]))
                expanded.extend([0] * packed[img].shape[0])
                img += 1
            elif t == self.audio_token_index and aud < len(packed_audio):
                slots.append(("a", len(expanded),
                              packed_audio[aud].shape[0]))
                expanded.extend([0] * packed_audio[aud].shape[0])
                aud += 1
            else:
                expanded.append(int(t))
        assert img == len(images), (
            f"{img} image placeholders but {len(images)} images")
        assert aud == len(packed_audio), (
            f"{aud} audio placeholders but {len(packed_audio)} audios")
        ids = jnp.asarray(np.asarray(expanded, np.int32))
        emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        ic = ac = 0
        for kind, pos, cnt in slots:
            if kind == "i":
                emb[pos:pos + cnt] = packed[ic]
                ic += 1
            else:
                emb[pos:pos + cnt] = packed_audio[ac]
                ac += 1
        return expanded, emb


class Phi4AudioEncoder:
    """Conformer speech encoder (HF `Phi4MultimodalAudioModel`): mean/var
    input norm, the NeMo conv-subsampling stack (stride-2 conv stages),
    relative-position attention bias, and conformer blocks
    (half-step macaron FFNs, attention, GLU-gated depthwise conv)."""

    def __init__(self, ac: dict):
        self.D = ac.get("hidden_size", 1024)
        self.nH = ac.get("num_attention_heads", 16)
        self.hd = self.D // self.nH
        self.I = ac.get("intermediate_size", 1536)
        self.blocks = ac.get("num_blocks", 24)
        self.F = ac.get("input_size", 80)
        self.C = ac.get("nemo_conv_channels", 1024)
        self.time_red = ac.get("time_reduction", 8)
        self.stages = int(np.log2(self.time_red))
        self.final_size = ac.get("nemo_final_size", 10)
        self.k = ac.get("kernel_size", 3)
        self.pw_out = ac.get("ext_pw_out_channel", self.D)
        self.max_dist = ac.get("bias_max_distance", 1000)
        self.symmetric = ac.get("bias_symmetric", False)
        self.chunk_size = ac.get("chunk_size", -1)
        self.left_chunk = ac.get("left_chunk", 18)
        self.downsample_rate = ac.get("downsample_rate", 1)

    def load_hf_weights(self, get_tensor, prefix: str) -> Dict:
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else np.asarray(a, np.float32)

        def lin(name):
            return (arr(name + ".weight").T, arr(name + ".bias"))

        def ln(name):
            return (arr(name + ".weight"), arr(name + ".bias"))

        sub = {"conv0": (arr("embed.conv.0.weight"), arr("embed.conv.0.bias"))}
        idx = 2
        for s in range(1, self.stages):
            sub[f"dw{s}"] = (arr(f"embed.conv.{idx}.weight"),
                             arr(f"embed.conv.{idx}.bias"))
            sub[f"pw{s}"] = (arr(f"embed.conv.{idx + 1}.weight"),
                             arr(f"embed.conv.{idx + 1}.bias"))
            idx += 3
        sub["out"] = lin("embed.out")

        layers = []
        for i in range(self.blocks):
            b = f"encoders.{i}."
            layers.append({
                "ff_in_ln": ln(b + "feed_forward_in.layer_norm"),
                "ff_in_gu": lin(b + "feed_forward_in.gate_up_proj"),
                "ff_in_down": lin(b + "feed_forward_in.down_proj"),
                "q": lin(b + "self_attn.q_proj"),
                "k": lin(b + "self_attn.k_proj"),
                "v": lin(b + "self_attn.v_proj"),
                "o": lin(b + "self_attn.o_proj"),
                "ln_att": ln(b + "layer_norm_att"),
                "conv_ln": ln(b + "conv.layer_norm"),
                "glu_w": (arr(b + "conv.glu.ext_pw_conv_1d.weight"),
                          arr(b + "conv.glu.ext_pw_conv_1d.bias")),
                "glu_b1": arr(b + "conv.glu.b1").reshape(-1),
                "glu_b2": arr(b + "conv.glu.b2").reshape(-1),
                "dw": (arr(b + "conv.dw_sep_conv_1d.dw_conv.weight"),
                       arr(b + "conv.dw_sep_conv_1d.dw_conv.bias")),
                "pw": (arr(b + "conv.dw_sep_conv_1d.pw_conv.weight"),
                       arr(b + "conv.dw_sep_conv_1d.pw_conv.bias")),
                "ext_pw": (arr(b + "conv.ext_pw_conv_1d.weight"),
                           arr(b + "conv.ext_pw_conv_1d.bias")),
                "ff_out_ln": ln(b + "feed_forward_out.layer_norm"),
                "ff_out_gu": lin(b + "feed_forward_out.gate_up_proj"),
                "ff_out_down": lin(b + "feed_forward_out.down_proj"),
                "final_ln": ln(b + "layer_norm"),
            })
        return {
            "mean": arr("encoder_embedding.global_mean"),
            "invstd": arr("encoder_embedding.global_invstd"),
            "subsample": sub,
            "rel_bias": arr("relative_attention_bias_layer.bias_values"
                            ".weight"),
            "layers": layers,
        }

    @staticmethod
    def _ln(x, p):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * p[0] + p[1]

    @staticmethod
    def _silu(x):
        return x / (1.0 + np.exp(-x))

    def _conv2d(self, x, w, b, stride, groups=1):
        import jax
        import jax.numpy as jnp
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (stride, stride),
            [(1, 1), (1, 1)] if stride == 2 else [(0, 0), (0, 0)],
            feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return np.asarray(out) + b.reshape(1, -1, 1, 1)

    def _subsample(self, params, x: np.ndarray) -> np.ndarray:
        """[T, F] -> [T', D]."""
        sub = params["subsample"]
        h = x[None, None]                      # [1, 1, T, F]
        h = np.maximum(self._conv2d(h, *sub["conv0"], 2), 0.0)
        for s in range(1, self.stages):
            h = self._conv2d(h, *sub[f"dw{s}"], 2, groups=self.C)
            w, b = sub[f"pw{s}"]
            h = h.transpose(0, 2, 3, 1) @ w[:, :, 0, 0].T + b
            h = np.maximum(h, 0.0).transpose(0, 3, 1, 2)
        h = h.transpose(0, 2, 1, 3).reshape(h.shape[2], -1)  # [T', C*F']
        return h @ sub["out"][0] + sub["out"][1]

    def __call__(self, params, features: np.ndarray) -> np.ndarray:
        """[T, input_size] log-mel features -> [T', D] encodings."""
        x = (features - params["mean"]) * params["invstd"]
        x = self._subsample(params, x)
        T = x.shape[0]

        rel = np.arange(T)[None, :] - np.arange(T)[:, None]
        rel = np.clip(rel, -self.max_dist, self.max_dist - 1)
        idx = np.abs(rel) if self.symmetric else rel + self.max_dist
        bias = params["rel_bias"][idx].transpose(2, 0, 1)      # [H, T, T]
        if self.chunk_size > 0:
            starts = np.arange(0, T, self.chunk_size)
            cid = np.searchsorted(starts, np.arange(T), side="right") - 1
            left = np.maximum(cid - self.left_chunk, 0)
            lo = starts[left]
            ends = np.append(starts[1:], T)
            ok = (np.arange(T)[None, :] >= lo[:, None]) & \
                (np.arange(T)[None, :] < ends[cid][:, None])
            bias = np.where(ok[None], bias, -1e30)

        nH, hd = self.nH, self.hd
        for lp in params["layers"]:
            h = self._ln(x, lp["ff_in_ln"])
            gu = h @ lp["ff_in_gu"][0] + lp["ff_in_gu"][1]
            up, gate = np.split(gu, 2, axis=-1)
            x = x + 0.5 * ((up * self._silu(gate)) @ lp["ff_in_down"][0]
                           + lp["ff_in_down"][1])
            h = self._ln(x, lp["ln_att"])
            q = (h @ lp["q"][0] + lp["q"][1]).reshape(T, nH, hd)
            k = (h @ lp["k"][0] + lp["k"][1]).reshape(T, nH, hd)
            v = (h @ lp["v"][0] + lp["v"][1]).reshape(T, nH, hd)
            s = np.einsum("qhd,khd->hqk", q, k) * hd ** -0.5 + bias
            s = s - s.max(-1, keepdims=True)
            pr = np.exp(s)
            pr = pr / pr.sum(-1, keepdims=True)
            att = np.einsum("hqk,khd->qhd", pr, v).reshape(T, nH * hd)
            x = x + (att @ lp["o"][0] + lp["o"][1])
            # GLU-gated depthwise conv module
            h = self._ln(x, lp["conv_ln"])
            gw = lp["glu_w"][0][:, :, 0]                       # [2C, D]
            g = h @ gw.T + lp["glu_w"][1]
            c1, c2 = np.split(g, 2, axis=-1)
            g = (c1 + lp["glu_b1"]) * self._silu(c2 + lp["glu_b2"])
            # depthwise conv over time, pad k-1 both sides, trim the tail
            kw = lp["dw"][0][:, 0, :]                          # [C, k]
            pad = np.pad(g, ((self.k - 1, self.k - 1), (0, 0)))
            conv = np.zeros_like(pad[:T + self.k - 1])
            for j in range(self.k):
                conv = conv + pad[j:j + T + self.k - 1] * kw[None, :, j].reshape(1, -1)
            conv = conv[:T] + lp["dw"][1]
            conv = conv @ lp["pw"][0][:, :, 0].T + lp["pw"][1]
            conv = self._silu(conv)
            conv = conv @ lp["ext_pw"][0][:, :, 0].T + lp["ext_pw"][1]
            x = x + conv
            h = self._ln(x, lp["ff_out_ln"])
            gu = h @ lp["ff_out_gu"][0] + lp["ff_out_gu"][1]
            up, gate = np.split(gu, 2, axis=-1)
            x = x + 0.5 * ((up * self._silu(gate)) @ lp["ff_out_down"][0]
                           + lp["ff_out_down"][1])
            x = self._ln(x, lp["final_ln"])
        return x


def _phi4mm_audio_init(enc: Phi4AudioEncoder, seed: int = 17) -> Dict:
    """Random host-side audio params matching the loader layout (used when
    no checkpoint is given; audio runs entirely on the host at input time,
    so these never enter the engine's param pytree)."""
    rng = np.random.RandomState(seed)
    D, I, C, F = enc.D, enc.I, enc.C, enc.F

    def lin(i, o):
        return (rng.randn(i, o).astype(np.float32) * (0.5 / i ** 0.5),
                np.zeros(o, np.float32))

    def ln():
        return (np.ones(D, np.float32), np.zeros(D, np.float32))

    sub = {"conv0": (rng.randn(C, 1, 3, 3).astype(np.float32) * 0.1,
                     np.zeros(C, np.float32))}
    for s in range(1, enc.stages):
        sub[f"dw{s}"] = (rng.randn(C, 1, 3, 3).astype(np.float32) * 0.1,
                         np.zeros(C, np.float32))
        sub[f"pw{s}"] = (rng.randn(C, C, 1, 1).astype(np.float32) * 0.1,
                         np.zeros(C, np.float32))
    sub["out"] = lin(C * enc.final_size, D)
    layers = []
    for _ in range(enc.blocks):
        layers.append({
            "ff_in_ln": ln(), "ff_in_gu": lin(D, 2 * I),
            "ff_in_down": lin(I, D),
            "q": lin(D, D), "k": lin(D, D), "v": lin(D, D), "o": lin(D, D),
            "ln_att": ln(), "conv_ln": ln(),
            "glu_w": (rng.randn(2 * enc.pw_out, D, 1).astype(np.float32)
                      * 0.1, np.zeros(2 * enc.pw_out, np.float32)),
            "glu_b1": np.zeros(enc.pw_out, np.float32),
            "glu_b2": np.zeros(enc.pw_out, np.float32),
            "dw": (rng.randn(D, 1, enc.k).astype(np.float32) * 0.1,
                   np.zeros(D, np.float32)),
            "pw": (rng.randn(D, D, 1).astype(np.float32) * 0.1,
                   np.zeros(D, np.float32)),
            "ext_pw": (rng.randn(D, D, 1).astype(np.float32) * 0.1,
                       np.zeros(D, np.float32)),
            "ff_out_ln": ln(), "ff_out_gu": lin(D, 2 * I),
            "ff_out_down": lin(I, D), "final_ln": ln(),
        })
    return {"mean": np.zeros(F, np.float32),
            "invstd": np.ones(F, np.float32),
            "subsample": sub,
            "rel_bias": rng.randn(
                enc.max_dist * (1 if enc.symmetric else 2),
                enc.nH).astype(np.float32) * 0.02,
            "layers": layers}
