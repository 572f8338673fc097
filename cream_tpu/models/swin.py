"""Swin-lineage model zoo: Swin, S3 (AutoFormerV2) and Mini-Swin (MiniViT).

  * SwinTransformer — standard Swin (the base the other two modify); covers
    the MiniViT baselines and the TinyCLIP/timm swin needs.
  * S3Transformer — AutoFormerV2's searched Swin variant: per-layer heads /
    window sizes / mlp ratios from the searched configs
    (AutoFormerV2/model/SSS.py:333-577 + configs/S3-{T,S,B}.yaml); head_dim
    fixed at 32 (SSS.py:79).
  * MiniSwin — weight multiplexing: each physical block runs its shared
    attention+MLP weights `share_num` times with alternating window shift,
    per-repeat LayerNorms, per-repeat head transforms proj_l/proj_w inside
    softmax, and per-repeat depthwise local conv
    (MiniViT/Mini-Swin/models/swin_transformer_minivit.py:200-344).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cream_tpu.models.registry import register_model
from cream_tpu.nn.swin import (
    SwinPatchEmbed, SwinPatchMerging, SwinWindowAttention, swin_attend)
from cream_tpu.ops.common import drop_path
from cream_tpu.nn.act import gelu

Dtype = Any


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    head_dim: int | None = None
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        res = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        attn = SwinWindowAttention(self.dim, min(self.window, H, W),
                                   self.num_heads, self.head_dim,
                                   dtype=self.dtype, name="attn")
        h = swin_attend(h, attn, self.window, self.shift, train=train)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        x = res + drop_path(h, self.drop_path_rate, not train, rng)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(h)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        return x + drop_path(h, self.drop_path_rate, not train, rng)


class SwinTransformer(nn.Module):
    """Standard Swin; also the S3 executor when per-layer lists are given."""
    num_classes: int = 1000
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Any = (3, 6, 12, 24)          # per-stage int or per-layer list
    window_sizes: Any = 7                     # int, per-stage, or per-layer list
    mlp_ratios: Any = 4.0
    head_dim: int | None = None
    drop_path_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def _per_layer(self, val, stage: int, i: int):
        if isinstance(val, (int, float)):
            return val
        v = val[stage]
        if isinstance(v, (int, float)):
            return v
        return v[i]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SwinPatchEmbed(self.embed_dims[0], dtype=self.dtype,
                           name="patch_embed")(x)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        for s, depth in enumerate(self.depths):
            base = sum(self.depths[:s])
            for i in range(depth):
                ws = int(self._per_layer(self.window_sizes, s, i))
                x = SwinBlock(self.embed_dims[s],
                              int(self._per_layer(self.num_heads, s, i)),
                              ws, 0 if i % 2 == 0 else ws // 2,
                              float(self._per_layer(self.mlp_ratios, s, i)),
                              self.head_dim, dpr[base + i], dtype=self.dtype,
                              name=f"layers_{s}_block_{i}")(x, train)
            if s < len(self.depths) - 1:
                x = SwinPatchMerging(self.embed_dims[s + 1], dtype=self.dtype,
                                     name=f"layers_{s}_downsample")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = x.mean(axis=(1, 2))
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


class MiniSwinBlock(nn.Module):
    """One physical block executed share_num times with shared attn/MLP."""
    dim: int
    num_heads: int
    window: int
    share_num: int
    init_shift: bool
    mlp_ratio: float = 4.0
    drop_path_rates: Sequence[float] = (0.0,)
    is_sep_layernorm: bool = True
    is_transform_heads: bool = True
    is_transform_ffn: bool = True
    capture_distill: bool = False   # sow qkv + hidden states for MiniViT KD
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = min(self.window, H, W)
        # shared weights (created once)
        attn = SwinWindowAttention(self.dim, ws, self.num_heads,
                                   sow_qkv=self.capture_distill,
                                   dtype=self.dtype, name="attn")
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                  name="mlp")

        is_shift = self.init_shift
        for r in range(self.share_num):
            res = x
            norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"norm1_list_{r}" if self.is_sep_layernorm
                                 else "norm1")
            h = norm1(x)
            proj_l = proj_w = None
            if self.is_transform_heads:
                proj_l = nn.Dense(self.num_heads, dtype=self.dtype,
                                  name=f"proj_l_{r}")
                proj_w = nn.Dense(self.num_heads, dtype=self.dtype,
                                  name=f"proj_w_{r}")
            shift = (ws // 2) if (is_shift and ws < min(H, W)) else 0
            h = swin_attend(h, attn, ws, shift, proj_l=proj_l, proj_w=proj_w,
                            train=train)
            dpr = self.drop_path_rates[r]
            rng = self.make_rng("drop_path") if (train and dpr > 0) else None
            x = res + drop_path(h, dpr, not train, rng)

            if self.is_transform_ffn:
                ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name=f"local_norm_list_{r}")
                h = ln(x)
                conv = nn.Conv(self.dim, (7, 7), padding=[(3, 3)] * 2,
                               feature_group_count=self.dim, dtype=self.dtype,
                               name=f"local_conv_list_{r}")
                x = h + conv(h)

            norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"norm2_list_{r}" if self.is_sep_layernorm
                                 else "norm2")
            h = mlp(norm2(x))
            rng = self.make_rng("drop_path") if (train and dpr > 0) else None
            x = x + drop_path(h, dpr, not train, rng)
            if self.capture_distill:
                # per-repeat hidden states for cal_hidden_relation_loss
                # (Mini-Swin/main.py:66-77)
                self.sow("intermediates", "hidden", x.reshape(B, H * W, C))
            is_shift = not is_shift
        return x


class MiniSwin(nn.Module):
    """Swin with weight multiplexing: depth[s] executed layers share
    depth[s]//share_num physical blocks (BasicLayer grouping,
    swin_transformer_minivit.py:487-504)."""
    num_classes: int = 1000
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    share_num: int = 2
    drop_path_rate: float = 0.1
    is_sep_layernorm: bool = True
    is_transform_heads: bool = True
    is_transform_ffn: bool = True
    capture_distill: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SwinPatchEmbed(self.embed_dims[0], dtype=self.dtype,
                           name="patch_embed")(x)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        for s, depth in enumerate(self.depths):
            share = min(self.share_num, depth)
            n_blocks = depth // share
            base = sum(self.depths[:s])
            for b in range(n_blocks):
                rates = tuple(dpr[base + b * share: base + (b + 1) * share])
                x = MiniSwinBlock(self.embed_dims[s], self.num_heads[s],
                                  self.window_size, share,
                                  init_shift=(b * share) % 2 == 1,
                                  mlp_ratio=self.mlp_ratio,
                                  drop_path_rates=rates,
                                  is_sep_layernorm=self.is_sep_layernorm,
                                  is_transform_heads=self.is_transform_heads,
                                  is_transform_ffn=self.is_transform_ffn,
                                  capture_distill=self.capture_distill,
                                  dtype=self.dtype,
                                  name=f"layers_{s}_block_{b}")(x, train)
            if s < len(self.depths) - 1:
                x = SwinPatchMerging(self.embed_dims[s + 1], dtype=self.dtype,
                                     name=f"layers_{s}_downsample")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = x.mean(axis=(1, 2))
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


# ---- registry ----

_SWIN = {
    "swin_tiny": ((96, 192, 384, 768), (2, 2, 6, 2), (3, 6, 12, 24), 0.2),
    "swin_small": ((96, 192, 384, 768), (2, 2, 18, 2), (3, 6, 12, 24), 0.3),
    "swin_base": ((128, 256, 512, 1024), (2, 2, 18, 2), (4, 8, 16, 32), 0.5),
}

# searched S3 configs (AutoFormerV2/configs/S3-{T,S,B}.yaml)
_S3 = {
    "s3_tiny": dict(embed_dims=(96, 192, 384, 768), depths=(2, 2, 6, 2),
                    num_heads=((3, 3), (6, 6), (12,) * 6, (24, 24)),
                    window_sizes=((7, 7), (7, 7), (14,) * 6, (7, 7))),
    "s3_small": dict(embed_dims=(96, 192, 384, 768), depths=(2, 2, 18, 2),
                     num_heads=((3, 3), (6, 6), (12,) * 18, (24, 24)),
                     window_sizes=((14, 14), (14, 14), (14,) * 18, (14, 14))),
    "s3_base": dict(embed_dims=(96, 192, 384, 768), depths=(2, 2, 30, 2),
                    num_heads=((3, 3), (6, 6), (12,) * 30, (24, 24)),
                    window_sizes=((7, 7), (7, 7), (14,) * 30, (7, 7))),
}

# share_num: tiny uses 6 (configs/swin_tiny_..._minivit_sharenum6.yaml),
# small/base use 2
_MINI_SWIN = {
    "mini_swin_tiny": ((96, 192, 384, 768), (2, 2, 6, 2), (3, 6, 12, 24), 0.2, 6),
    "mini_swin_small": ((96, 192, 384, 768), (2, 2, 18, 2), (3, 6, 12, 24), 0.3, 2),
    "mini_swin_base": ((128, 256, 512, 1024), (2, 2, 18, 2), (4, 8, 16, 32), 0.5, 2),
}


def _reg():
    for name, (dims, depths, heads, dp) in _SWIN.items():
        def f(num_classes=1000, dtype=jnp.float32, _a=(dims, depths, heads, dp), **kw):
            d, de, h, p = _a
            return SwinTransformer(num_classes=num_classes, embed_dims=d,
                                   depths=de, num_heads=h, drop_path_rate=p,
                                   dtype=dtype, **kw)
        f.__name__ = name
        register_model(f)
    for name, cfg in _S3.items():
        def f(num_classes=1000, dtype=jnp.float32, _cfg=cfg, **kw):
            return SwinTransformer(num_classes=num_classes, head_dim=32,
                                   dtype=dtype, **_cfg, **kw)
        f.__name__ = name
        register_model(f)
    for name, (dims, depths, heads, dp, share) in _MINI_SWIN.items():
        def f(num_classes=1000, dtype=jnp.float32,
              _a=(dims, depths, heads, dp, share), **kw):
            d, de, h, p, sh = _a
            return MiniSwin(num_classes=num_classes, embed_dims=d, depths=de,
                            num_heads=h, drop_path_rate=p, share_num=sh,
                            dtype=dtype, **kw)
        f.__name__ = name
        register_model(f)


_reg()
