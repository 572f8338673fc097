"""CLIP two-tower model with L0-prunable gates (TinyCLIP).

TPU-native rebuild of TinyCLIP/src/open_clip/model.py: VisualTransformer
(:442-545) + text Transformer (:682-845) wrapped as CLIP, every submodule
accepting the TinyCLIP mask set {hidden_z, heads_z, mha_z, intermediate_z,
ffn_z} (:208-341) for L0 structured pruning, plus host-side `prune_clip`
materialization (the reference's per-module .prune()).

Gate semantics (matching the reference exactly):
  hidden_z (width,)        multiplies embeddings + every residual output;
                           LayerNorm statistics restrict to nonzero gates
  heads_z (layers, heads)  multiplies each head's attention output
  mha_z (layers,)          scales whole attention branches
  intermediate_z (L, I)    multiplies MLP hidden activations
  ffn_z (layers,)          scales whole MLP branches

Towers support per-layer head counts / MLP widths so pruned models stay
first-class citizens of the same classes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.models.registry import register_model

Dtype = Any


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MaskedLayerNorm(nn.Module):
    """LayerNorm whose statistics are computed over nonzero-gated channels
    only (TinyCLIP model.py:40-68)."""
    dim: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hidden_z: Optional[jnp.ndarray] = None):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        if hidden_z is None:
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            return (y * scale + bias).astype(self.dtype)
        m = (hidden_z != 0).astype(jnp.float32)
        d = jnp.maximum(m.sum(), 1.0)
        xm = xf * m
        mean = xm.sum(-1, keepdims=True) / d
        var = (((xm - mean) * m) ** 2).sum(-1, keepdims=True) / d
        y = (xm - mean) * jax.lax.rsqrt(var + self.epsilon)
        return ((y * scale + bias) * m).astype(self.dtype)


class GatedAttention(nn.Module):
    """Standard MHA with per-head and hidden gates. qkv kernel column layout
    is [q(h0..hH); k(...); v(...)] matching torch in_proj rows."""
    width: int
    heads: int
    head_dim: int | None = None     # stays fixed (64) when width is pruned
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, heads_z=None, hidden_z=None):
        B, L, W = x.shape
        H = self.heads
        hd = self.head_dim if self.head_dim is not None else W // H
        qkv = nn.Dense(3 * H * hd, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32)
        if attn_mask is not None:
            sim = sim + attn_mask
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        if heads_z is not None:
            out = out * heads_z.reshape(1, H, 1, 1).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, H * hd)
        out = nn.Dense(W, dtype=self.dtype, name="out_proj")(out)
        if hidden_z is not None:
            out = out * hidden_z.astype(self.dtype)
        return out


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    mlp_width: int
    act: str = "gelu"
    head_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, hidden_z=None, heads_z=None,
                 mha_z=None, intermediate_z=None, ffn_z=None):
        from cream_tpu.nn.act import gelu as _gelu
        act = quick_gelu if self.act == "quick_gelu" else _gelu
        # heads == 0 / mlp_width == 0 mean the branch was L0-pruned away
        # entirely (mha_z/ffn_z/all-heads drop): the sublayer is skipped and
        # owns no params — block-skipping materialization for prune_clip.
        if self.heads > 0:
            h = MaskedLayerNorm(self.width, dtype=self.dtype, name="ln_1")(x, hidden_z)
            h = GatedAttention(self.width, self.heads, head_dim=self.head_dim,
                               dtype=self.dtype,
                               name="attn")(h, attn_mask, heads_z, hidden_z)
            if mha_z is not None:
                h = h * mha_z.astype(self.dtype)
            x = x + h

        if self.mlp_width > 0:
            h = MaskedLayerNorm(self.width, dtype=self.dtype, name="ln_2")(x, hidden_z)
            h = nn.Dense(self.mlp_width, dtype=self.dtype, name="c_fc")(h)
            h = act(h)
            if intermediate_z is not None:
                h = h * intermediate_z.astype(self.dtype)
            h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
            if hidden_z is not None:
                h = h * hidden_z.astype(self.dtype)
            if ffn_z is not None:
                h = h * ffn_z.astype(self.dtype)
            x = x + h
        return x


def _layer_gates(masks: Optional[dict], i: int) -> dict:
    if not masks:
        return {}
    out = {}
    if masks.get("hidden_z") is not None:
        out["hidden_z"] = masks["hidden_z"]
    for name in ("heads_z", "mha_z", "intermediate_z", "ffn_z"):
        if masks.get(name) is not None:
            out[name[:-2] + "_z"] = masks[name][i]
    return out


class CLIPTransformer(nn.Module):
    width: int
    layers: int
    heads: Sequence[int]            # per-layer
    mlp_widths: Sequence[int]       # per-layer
    act: str = "gelu"
    remat: bool = False             # rematerialize blocks under AD — replaces
                                    # TinyCLIP's grad-cache (SURVEY.md §2.3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, masks: Optional[dict] = None):
        block_cls = nn.remat(ResidualAttentionBlock,
                             static_argnums=()) if self.remat \
            else ResidualAttentionBlock
        for i in range(self.layers):
            x = block_cls(
                self.width, self.heads[i], self.mlp_widths[i], self.act,
                dtype=self.dtype, name=f"resblocks_{i}")(
                    x, attn_mask, **_layer_gates(masks, i))
        return x


class VisionTower(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: Sequence[int] | None = None
    mlp_widths: Sequence[int] | None = None
    output_dim: int = 512
    act: str = "gelu"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, masks: Optional[dict] = None,
                 normalized: bool = False):
        W = self.width
        p = self.patch_size
        heads = self.heads or [W // 64] * self.layers
        mlps = self.mlp_widths or [W * 4] * self.layers
        B = image.shape[0]
        g = image.shape[1] // p
        x = nn.Conv(W, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, name="conv1")(image)
        x = x.reshape(B, g * g, W)
        cls = self.param("class_embedding",
                         nn.initializers.normal(W ** -0.5), (W,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, W)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(W ** -0.5),
                         (g * g + 1, W), jnp.float32)
        x = x + pos.astype(self.dtype)
        hz = masks.get("hidden_z") if masks else None
        if hz is not None:
            x = x * hz.astype(self.dtype)
        x = MaskedLayerNorm(W, dtype=self.dtype, name="ln_pre")(x, hz)
        x = CLIPTransformer(W, self.layers, tuple(heads), tuple(mlps),
                            self.act, remat=self.remat, dtype=self.dtype,
                            name="transformer")(x, masks=masks)
        x = MaskedLayerNorm(W, dtype=self.dtype, name="ln_post")(x[:, 0], hz)
        proj = self.param("proj", nn.initializers.normal(W ** -0.5),
                          (W, self.output_dim), jnp.float32)
        x = x @ proj.astype(self.dtype)
        if normalized:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x


class TextTower(nn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: Sequence[int] | None = None
    mlp_widths: Sequence[int] | None = None
    output_dim: int = 512
    act: str = "gelu"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, masks: Optional[dict] = None,
                 normalized: bool = False):
        W = self.width
        heads = self.heads or [W // 64] * self.layers
        mlps = self.mlp_widths or [W * 4] * self.layers
        emb = nn.Embed(self.vocab_size, W,
                       embedding_init=nn.initializers.normal(0.02),
                       dtype=self.dtype, name="token_embedding")
        x = emb(text)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, W), jnp.float32)
        x = x + pos[:text.shape[1]].astype(self.dtype)
        L = text.shape[1]
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        hz = masks.get("hidden_z") if masks else None
        x = CLIPTransformer(W, self.layers, tuple(heads), tuple(mlps),
                            self.act, remat=self.remat, dtype=self.dtype,
                            name="transformer")(
                                x, attn_mask=causal, masks=masks)
        x = MaskedLayerNorm(W, dtype=self.dtype, name="ln_final")(x, hz)
        # pool at the EOT token (highest token id — model.py:796)
        eot = jnp.argmax(text, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(W ** -0.5),
                          (W, self.output_dim), jnp.float32)
        x = x @ proj.astype(self.dtype)
        if normalized:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    vision_width: int = 768
    vision_layers: int = 12
    vision_patch: int = 16
    image_size: int = 224
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408


class CLIP(nn.Module):
    cfg: CLIPConfig = CLIPConfig()
    quick_gelu: bool = False
    vision_heads: Sequence[int] | None = None
    vision_mlp_widths: Sequence[int] | None = None
    text_heads_per_layer: Sequence[int] | None = None
    text_mlp_widths: Sequence[int] | None = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        act = "quick_gelu" if self.quick_gelu else "gelu"
        self.visual = VisionTower(
            image_size=c.image_size, patch_size=c.vision_patch,
            width=c.vision_width, layers=c.vision_layers,
            heads=self.vision_heads, mlp_widths=self.vision_mlp_widths,
            output_dim=c.embed_dim, act=act, remat=self.remat,
            dtype=self.dtype)
        self.text = TextTower(
            context_length=c.context_length, vocab_size=c.vocab_size,
            width=c.text_width, layers=c.text_layers,
            heads=self.text_heads_per_layer or [c.text_heads] * c.text_layers,
            mlp_widths=self.text_mlp_widths,
            output_dim=c.embed_dim, act=act, remat=self.remat,
            dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32))

    def encode_image(self, image, masks=None, normalized: bool = True):
        return self.visual(image, masks=masks, normalized=normalized)

    def encode_text(self, text, masks=None, normalized: bool = True):
        return self.text(text, masks=masks, normalized=normalized)

    def __call__(self, image, text, image_masks=None, text_masks=None):
        img = self.encode_image(image, masks=image_masks)
        txt = self.encode_text(text, masks=text_masks)
        return img, txt, jnp.exp(self.logit_scale)


class CLIPClassifier(nn.Module):
    """CLIP vision tower + linear classification head — the TinyViT
    distillation teacher (TinyViT/models/clip.py:108-158; built for
    model_type 'clip_vit_large14_224' in TinyViT/models/build.py:28-35).
    Logits = head(proj(features)); with a 22k head the caller applies the
    22k->1k remap (zoo/remap.py) like save_logits.py:30-31."""
    cfg: CLIPConfig = CLIPConfig()
    num_classes: int = 1000
    quick_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = False):
        c = self.cfg
        act = "quick_gelu" if self.quick_gelu else "gelu"
        feats = VisionTower(
            image_size=c.image_size, patch_size=c.vision_patch,
            width=c.vision_width, layers=c.vision_layers,
            output_dim=c.embed_dim, act=act, dtype=self.dtype,
            name="visual")(image)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(feats)


def _prune_tower(params: dict, masks: dict, layers: int, head_dim: int,
                 is_text: bool) -> tuple[dict, list[int], list[int], int]:
    """Materialize one tower's pruned params (reference per-module .prune():
    model.py:70-100 LayerNorm, :139-167 Mlp, :169-207 MultiheadAttention,
    :545+ VisualTransformer). Returns (params, heads_per_layer,
    mlp_widths, new_width)."""
    hz = np.asarray(masks["hidden_z"]) if masks.get("hidden_z") is not None \
        else None
    W = params["ln_pre" if not is_text else "ln_final"]["scale"].shape[0]
    hidden_r = np.where(hz != 0)[0] if hz is not None else np.arange(W)
    new_w = len(hidden_r)

    def ln(p):
        return {"scale": np.asarray(p["scale"])[hidden_r],
                "bias": np.asarray(p["bias"])[hidden_r]}

    out: dict = {}
    if not is_text:
        conv_k = np.asarray(params["conv1"]["kernel"])
        if hz is not None:
            conv_k = conv_k * hz[None, None, None, :]
        out["conv1"] = {"kernel": conv_k[..., hidden_r]}
        cls = np.asarray(params["class_embedding"])
        pos = np.asarray(params["positional_embedding"])
        if hz is not None:
            cls, pos = cls * hz, pos * hz[None, :]
        out["class_embedding"] = cls[hidden_r]
        out["positional_embedding"] = pos[:, hidden_r]
        out["ln_pre"] = ln(params["ln_pre"])
        out["ln_post"] = ln(params["ln_post"])
        out["proj"] = np.asarray(params["proj"])[hidden_r]
    else:
        emb = np.asarray(params["token_embedding"]["embedding"])
        pos = np.asarray(params["positional_embedding"])
        if hz is not None:
            emb, pos = emb * hz[None, :], pos * hz[None, :]
        out["token_embedding"] = {"embedding": emb[:, hidden_r]}
        out["positional_embedding"] = pos[:, hidden_r]
        out["ln_final"] = ln(params["ln_final"])
        out["text_projection"] = np.asarray(params["text_projection"])[hidden_r]

    heads_per_layer, mlp_widths = [], []
    tr_out: dict = {}
    for i in range(layers):
        blk = params["transformer"][f"resblocks_{i}"]
        heads_z = np.asarray(masks["heads_z"][i]) \
            if masks.get("heads_z") is not None else None
        mha_z = float(masks["mha_z"][i]) if masks.get("mha_z") is not None else 1.0
        inter_z = np.asarray(masks["intermediate_z"][i]) \
            if masks.get("intermediate_z") is not None else None
        ffn_z = float(masks["ffn_z"][i]) if masks.get("ffn_z") is not None else 1.0

        # a previously-pruned block may already lack a branch (heads == 0 /
        # mlp_width == 0): treat it as permanently dropped
        has_attn, has_ffn = "attn" in blk, "c_fc" in blk
        H = blk["attn"]["in_proj"]["kernel"].shape[1] // (3 * head_dim) \
            if has_attn else 0
        head_r = np.where(heads_z != 0)[0] if heads_z is not None else np.arange(H)
        I = blk["c_fc"]["kernel"].shape[1] if has_ffn else 0
        inter_r = np.where(inter_z != 0)[0] if inter_z is not None else np.arange(I)
        # whole-branch drops (mha_z/ffn_z == 0 or every head/channel gated
        # off) materialize as heads/mlp_width == 0: the block skips the
        # sublayer entirely and emits no params for it.
        drop_attn = not has_attn or mha_z == 0.0 or len(head_r) == 0
        drop_ffn = not has_ffn or ffn_z == 0.0 or len(inter_r) == 0
        heads_per_layer.append(0 if drop_attn else len(head_r))
        mlp_widths.append(0 if drop_ffn else len(inter_r))
        layer_out: dict = {}

        if not drop_attn:
            ipk = np.asarray(blk["attn"]["in_proj"]["kernel"])   # (W, 3*H*hd)
            ipk = ipk.reshape(W, 3, H, head_dim)[hidden_r][:, :, head_r]
            ipb = np.asarray(blk["attn"]["in_proj"]["bias"]).reshape(3, H, head_dim)[:, head_r]
            opk = np.asarray(blk["attn"]["out_proj"]["kernel"])  # (H*hd, W)
            opk = opk * (1.0 if hz is None else hz[None, :]) * mha_z
            if heads_z is not None:
                opk = opk.reshape(H, head_dim, W) * heads_z[:, None, None]
                opk = opk.reshape(H * head_dim, W)
            opk = opk.reshape(H, head_dim, W)[head_r][:, :, hidden_r]
            opb = np.asarray(blk["attn"]["out_proj"]["bias"])
            opb = (opb * (1.0 if hz is None else hz)) * mha_z
            layer_out["ln_1"] = ln(blk["ln_1"])
            layer_out["attn"] = {
                "in_proj": {"kernel": ipk.reshape(new_w, -1),
                            "bias": ipb.reshape(-1)},
                "out_proj": {"kernel": opk.reshape(-1, new_w),
                             "bias": opb[hidden_r]},
            }

        if not drop_ffn:
            fck = np.asarray(blk["c_fc"]["kernel"])[hidden_r][:, inter_r]
            fcb = np.asarray(blk["c_fc"]["bias"])[inter_r]
            cpk = np.asarray(blk["c_proj"]["kernel"])
            cpk = cpk * (1.0 if inter_z is None else inter_z[:, None]) \
                * (1.0 if hz is None else hz[None, :]) * ffn_z
            cpk = cpk[inter_r][:, hidden_r]
            cpb = np.asarray(blk["c_proj"]["bias"])
            cpb = (cpb * (1.0 if hz is None else hz)) * ffn_z
            layer_out["ln_2"] = ln(blk["ln_2"])
            layer_out["c_fc"] = {"kernel": fck, "bias": fcb}
            layer_out["c_proj"] = {"kernel": cpk, "bias": cpb[hidden_r]}

        if layer_out:
            tr_out[f"resblocks_{i}"] = layer_out
    out["transformer"] = tr_out
    return out, heads_per_layer, mlp_widths, new_w


def prune_clip(variables: dict, cfg: CLIPConfig, vision_masks: dict | None,
               text_masks: dict | None, quick_gelu: bool = False,
               dtype=jnp.float32, head_dim: int = 64):
    """Materialize an L0-pruned CLIP: returns (model, variables) with masked
    channels physically removed and soft gate values folded into weights."""
    p = variables["params"]
    new_p = {"logit_scale": np.asarray(p["logit_scale"])}
    v_heads = v_mlps = t_heads = t_mlps = None
    new_vw, new_tw = cfg.vision_width, cfg.text_width
    if vision_masks:
        vp, v_heads, v_mlps, new_vw = _prune_tower(
            p["visual"], vision_masks, cfg.vision_layers, head_dim, False)
        new_p["visual"] = vp
    else:
        new_p["visual"] = p["visual"]
    if text_masks:
        tp, t_heads, t_mlps, new_tw = _prune_tower(
            p["text"], text_masks, cfg.text_layers, head_dim, True)
        new_p["text"] = tp
    else:
        new_p["text"] = p["text"]

    new_cfg = dataclasses.replace(cfg, vision_width=new_vw, text_width=new_tw)
    model = CLIP(cfg=new_cfg, quick_gelu=quick_gelu,
                 vision_heads=v_heads, vision_mlp_widths=v_mlps,
                 text_heads_per_layer=t_heads, text_mlp_widths=t_mlps,
                 dtype=dtype)
    return model, {"params": jax.tree_util.tree_map(jnp.asarray, new_p)}


# configs from TinyCLIP/src/open_clip/model_configs/*.json
_CLIP_CONFIGS = {
    "tinyclip_vit_39m_16_text_19m": CLIPConfig(
        vision_width=512, vision_layers=12, vision_patch=16,
        text_width=512, text_layers=6),
    "tinyclip_vit_8m_16_text_3m": CLIPConfig(
        vision_width=256, vision_layers=10, vision_patch=16,
        text_width=256, text_layers=3, text_heads=4),
    "tinyclip_vit_40m_32_text_19m": CLIPConfig(
        vision_width=512, vision_layers=12, vision_patch=32,
        text_width=512, text_layers=6),
    "tinyclip_vit_61m_32_text_29m": CLIPConfig(
        vision_width=640, vision_layers=12, vision_patch=32,
        text_width=512, text_layers=9),
    "clip_vit_b_16": CLIPConfig(vision_width=768, vision_layers=12,
                                vision_patch=16),
    "clip_vit_b_32": CLIPConfig(vision_width=768, vision_layers=12,
                                vision_patch=32),
}


def _make_factory(name, cfg):
    def factory(quick_gelu: bool = False, dtype=jnp.float32, **kw):
        return CLIP(cfg=cfg, quick_gelu=quick_gelu, dtype=dtype, **kw)
    factory.__name__ = name
    return factory


for _name, _cfg in _CLIP_CONFIGS.items():
    register_model(_make_factory(_name, _cfg))


# classification-teacher variants (vision tower + head). The large/14 config
# mirrors TinyViT/models/build.py:29-34 (embed_dim 768, width 1024, 24 layers).
_CLIP_CLASSIFIER_CONFIGS = {
    "clip_vit_b_16_classifier": _CLIP_CONFIGS["clip_vit_b_16"],
    "clip_vit_b_32_classifier": _CLIP_CONFIGS["clip_vit_b_32"],
    "clip_vit_large14_224_classifier": CLIPConfig(
        embed_dim=768, vision_width=1024, vision_layers=24, vision_patch=14),
}


def _make_classifier_factory(name, cfg):
    def factory(num_classes: int = 1000, quick_gelu: bool = False,
                dtype=jnp.float32, **kw):
        return CLIPClassifier(cfg=cfg, num_classes=num_classes,
                              quick_gelu=quick_gelu, dtype=dtype, **kw)
    factory.__name__ = name
    return factory


for _name, _cfg in _CLIP_CLASSIFIER_CONFIGS.items():
    register_model(_make_classifier_factory(_name, _cfg))
