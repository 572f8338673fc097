"""DETR-with-iRPE: detection transformer with 2D relative position encoding
injected into the encoder self-attention.

TPU-native rebuild of iRPE/DETR-with-iRPE/models/{transformer.py,detr.py,
position_encoding.py} + rpe_attention/{multi_head_attention.py,
rpe_attention_function.py}. Differences from the reference by design:

  * batch-first (B, N, E) and NHWC feature maps everywhere (torch is
    seq-first (N, B, E) / NCHW) — importers transpose.
  * the RPE bucket tables are host-side numpy constants folded into the jit
    at trace time (ops/rpe.py), replacing the rpe_index CUDA op.
  * masks are additive -1e9 biases instead of boolean masked_fill — fully
    padded rows stay finite (torch emits NaN there).

Reference call structure mirrored exactly:
  * q is pre-scaled by head_dim**-0.5 BEFORE rpe_k sees it; rpe_q receives
    k * scaling; rpe_v adds to the attention output
    (rpe_attention_function.py:324-377)
  * encoder q=k=src+pos, value=src (transformer.py:224-236)
  * decoder self-attn q=k=tgt+query_pos, cross-attn k=memory+pos
    (transformer.py:276-298)
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.nn.rpe import IRPE
from cream_tpu.ops.rpe import RPEConfig, get_rpe_config

Dtype = Any
NEG_INF = -1e9


def parse_enc_rpe2d(spec: str) -> RPEConfig | None:
    """'rpe-{ratio}-{method}-{mode}-{shared_head}-{rpe_on}' — the
    --enc_rpe2d CLI format (transformer.py:51-69)."""
    if not spec:
        return None
    sp = spec.split("-")
    assert len(sp) == 6 and sp[0] == "rpe", spec
    return get_rpe_config(ratio=float(sp[1]), method=sp[2], mode=sp[3],
                          shared_head=bool(int(sp[4])), skip=0, rpe_on=sp[5])


class RPEMultiheadAttention(nn.Module):
    """Multi-head attention with optional 2D RPE on q/k/v, batch-first.

    Torch-compatible param layout: in_proj kernel (E, 3E) (transpose of
    torch's in_proj_weight), out_proj Dense. q/k/v may be distinct tensors
    (the encoder passes q=k=src+pos, value=src)."""
    embed_dim: int
    num_heads: int
    rpe_config: RPEConfig | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None,
                 attn_mask=None, hw: tuple | None = None):
        E, H = self.embed_dim, self.num_heads
        d = E // H
        scale = float(d) ** -0.5
        B, Lq, _ = query.shape
        Lk = key.shape[1]

        w = self.param("in_proj_kernel",
                       nn.initializers.xavier_uniform(), (E, 3 * E),
                       jnp.float32).astype(self.dtype)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,),
                       jnp.float32).astype(self.dtype)
        q = query @ w[:, :E] + b[:E]
        k = key @ w[:, E:2 * E] + b[E:2 * E]
        v = value @ w[:, 2 * E:] + b[2 * E:]
        q = q * scale

        q = q.reshape(B, Lq, H, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, H, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, H, d).transpose(0, 2, 1, 3)

        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32)
        cfg = self.rpe_config
        if cfg is not None and cfg.rpe_k is not None:
            sim = sim + IRPE(d, H, cfg.rpe_k, transposed=True,
                             dtype=self.dtype, name="rpe_k")(q, *hw)
        if cfg is not None and cfg.rpe_q is not None:
            sim = sim + IRPE(d, H, cfg.rpe_q, transposed=True,
                             dtype=self.dtype,
                             name="rpe_q")(k * scale, *hw).transpose(0, 1, 3, 2)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                sim = jnp.where(attn_mask, NEG_INF, sim)
            else:
                sim = sim + attn_mask
        if key_padding_mask is not None:
            sim = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, sim)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        if cfg is not None and cfg.rpe_v is not None:
            out = out + IRPE(d, H, cfg.rpe_v, transposed=False,
                             dtype=self.dtype, name="rpe_v")(attn, *hw)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return nn.Dense(E, dtype=self.dtype, name="out_proj")(out)


class _FFN(nn.Module):
    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(x)
        h = jax.nn.relu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    normalize_before: bool = False
    rpe_config: RPEConfig | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_key_padding_mask=None, pos=None, hw=None):
        def attn_block(x):
            q = x if pos is None else x + pos
            return RPEMultiheadAttention(
                self.d_model, self.nhead, self.rpe_config, dtype=self.dtype,
                name="self_attn")(q, q, x,
                                  key_padding_mask=src_key_padding_mask,
                                  hw=hw)
        ln1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        ln2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dtype, name="ffn")
        if self.normalize_before:
            src = src + attn_block(ln1(src))
            return src + ffn(ln2(src))
        src = ln1(src + attn_block(src))
        return ln2(src + ffn(src))


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    normalize_before: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_key_padding_mask=None,
                 pos=None, query_pos=None):
        mha = lambda name: RPEMultiheadAttention(
            self.d_model, self.nhead, None, dtype=self.dtype, name=name)
        add = lambda a, b: a if b is None else a + b
        ln1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        ln2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        ln3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dtype, name="ffn")

        def self_block(x):
            q = add(x, query_pos)
            return mha("self_attn")(q, q, x)

        def cross_block(x):
            return mha("multihead_attn")(
                add(x, query_pos), add(memory, pos), memory,
                key_padding_mask=memory_key_padding_mask)

        if self.normalize_before:
            tgt = tgt + self_block(ln1(tgt))
            tgt = tgt + cross_block(ln2(tgt))
            return tgt + ffn(ln3(tgt))
        tgt = ln1(tgt + self_block(tgt))
        tgt = ln2(tgt + cross_block(tgt))
        return ln3(tgt + ffn(tgt))


class DETRTransformer(nn.Module):
    """Encoder-decoder over an NHWC feature map; returns per-decoder-layer
    outputs (layers, B, Q, E) + the encoded memory (B, H, W, C)
    (transformer.py:98-111)."""
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    normalize_before: bool = False
    rpe_config: RPEConfig | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask, query_embed, pos_embed):
        B, H, W, C = src.shape
        x = src.reshape(B, H * W, C)
        pos = pos_embed.reshape(B, H * W, C)
        kpm = mask.reshape(B, H * W) if mask is not None else None

        for i in range(self.num_encoder_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.normalize_before, self.rpe_config, dtype=self.dtype,
                name=f"encoder_layers_{i}")(x, kpm, pos, hw=(H, W))
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="encoder_norm")(x)
        memory = x

        q = jnp.broadcast_to(query_embed[None], (B,) + query_embed.shape)
        tgt = jnp.zeros_like(q)
        dec_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        inter = []
        for i in range(self.num_decoder_layers):
            tgt = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.normalize_before, dtype=self.dtype,
                name=f"decoder_layers_{i}")(tgt, memory, kpm, pos, q)
            inter.append(dec_norm(tgt))
        hs = jnp.stack(inter)                      # (layers, B, Q, E)
        return hs, memory.reshape(B, H, W, C)


def sine_position_embedding(mask: jnp.ndarray, num_pos_feats: int = 128,
                            temperature: float = 10000.0,
                            normalize: bool = True,
                            scale: float | None = None) -> jnp.ndarray:
    """NHWC sine embedding from a (B, H, W) padding mask (True = pad);
    position_encoding.py:28-48. Channels = concat(pos_y, pos_x)."""
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    y = jnp.cumsum(not_mask, 1)
    x = jnp.cumsum(not_mask, 2)
    if normalize:
        eps = 1e-6
        y = y / (y[:, -1:, :] + eps) * scale
        x = x / (x[:, :, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   -1).reshape(*px.shape[:-1], -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   -1).reshape(*py.shape[:-1], -1)
    return jnp.concatenate([py, px], -1)           # (B, H, W, 2*feats)


class MLP(nn.Module):
    """3-layer box head (detr.py:289-300)."""
    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                     name=f"layers_{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layers_{self.num_layers - 1}")(x)


class DETR(nn.Module):
    """Full detection model (detr.py:21-80): backbone -> 1x1 input_proj ->
    transformer -> class/box heads. `backbone` is any flax module mapping
    (images NHWC, pixel mask (B,H,W)) -> (features NHWC, downsampled mask);
    see models/resnet.py:ResNetBackbone."""
    backbone: nn.Module
    num_classes: int = 91
    num_queries: int = 100
    hidden_dim: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    aux_loss: bool = False
    rpe_config: RPEConfig | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, pixel_mask=None):
        B = images.shape[0]
        if pixel_mask is None:
            pixel_mask = jnp.zeros(images.shape[:3], jnp.bool_)
        feat, mask = self.backbone(images, pixel_mask)
        src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                      name="input_proj")(feat)
        pos = sine_position_embedding(mask, self.hidden_dim // 2
                                      ).astype(self.dtype)
        query_embed = self.param("query_embed",
                                 nn.initializers.normal(1.0),
                                 (self.num_queries, self.hidden_dim),
                                 jnp.float32)
        hs, _ = DETRTransformer(
            self.hidden_dim, self.nhead, self.num_encoder_layers,
            self.num_decoder_layers, self.dim_feedforward,
            rpe_config=self.rpe_config, dtype=self.dtype,
            name="transformer")(src, mask, query_embed.astype(self.dtype), pos)
        logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="class_embed")(hs)
        boxes = jax.nn.sigmoid(MLP(self.hidden_dim, 4, dtype=self.dtype,
                                   name="bbox_embed")(hs))
        out = {"pred_logits": logits[-1], "pred_boxes": boxes[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_boxes": boxes[i]}
                for i in range(logits.shape[0] - 1)]
        return out


from cream_tpu.models.registry import register_model  # noqa: E402
from cream_tpu.models.resnet import ResNetBackbone  # noqa: E402


@register_model(name="detr_resnet50")
def detr_resnet50(enc_rpe2d: str = "", **kw):
    """DETR-R50 (detr.py build(); --enc_rpe2d 'rpe-2.0-product-ctx-1-k' is
    the paper's iRPE encoder setting)."""
    return DETR(backbone=ResNetBackbone((3, 4, 6, 3), "bottleneck"),
                rpe_config=parse_enc_rpe2d(enc_rpe2d), **kw)


@register_model(name="detr_resnet18")
def detr_resnet18(enc_rpe2d: str = "", **kw):
    return DETR(backbone=ResNetBackbone((2, 2, 2, 2), "basic"),
                rpe_config=parse_enc_rpe2d(enc_rpe2d), **kw)
