"""TinyViT — hierarchical tiny ViT (conv stem + windowed bias-attention stages).

TPU-native rebuild of TinyViT/models/tiny_vit.py:453-524 and its variants
(:641-703). Architecture: 4-stage pyramid —
  stage 0: ConvLayer of MBConvs (stride-4 conv patch embed before it)
  stages 1-3: TinyViTBlocks = window BiasAttention + depthwise local conv + MLP,
              PatchMerging (1x1 → 3x3 dw stride-2 → 1x1, all Conv+BN) between stages.
Head: mean-pool tokens → LayerNorm → Dense.

Everything is NHWC; token stages carry (B, H, W, C) and flatten only around the
attention windows, so the local_conv needs no layout permutes (the reference
round-trips NCHW↔(B,L,C) every block, tiny_vit.py:374-376 — unnecessary on TPU).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cream_tpu.models.registry import register_model
from cream_tpu.nn.attention import WindowBiasAttention
from cream_tpu.nn.layers import ConvBN, MBConv, MlpLN
from cream_tpu.ops.common import drop_path
from cream_tpu.nn.act import gelu

Dtype = Any


class PatchEmbed(nn.Module):
    """Two stride-2 Conv+BN with GELU between: 4x spatial reduction."""
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.embed_dim // 2, 3, 2, 1, dtype=self.dtype, name="conv1")(x, train)
        x = gelu(x)
        x = ConvBN(self.embed_dim, 3, 2, 1, dtype=self.dtype, name="conv2")(x, train)
        return x


class PatchMerging(nn.Module):
    """1x1 ConvBN → GELU → 3x3 dw stride-2 ConvBN → GELU → 1x1 ConvBN (2x down)."""
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x, train)
        x = gelu(x)
        x = ConvBN(self.out_dim, 3, 2, 1, groups=self.out_dim, dtype=self.dtype, name="conv2")(x, train)
        x = gelu(x)
        x = ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x, train)
        return x


class TinyViTBlock(nn.Module):
    """Window bias-attention + residual, depthwise local conv, MLP + residual."""
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path_rate: float = 0.0
    local_conv_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        head_dim = self.dim // self.num_heads

        res = x
        h = WindowBiasAttention(self.dim, head_dim, self.num_heads, window=ws,
                                attn_ratio=1.0, dtype=self.dtype,
                                name="attn")(x, train)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        x = res + drop_path(h, self.drop_path_rate, not train, rng)

        pad = self.local_conv_size // 2
        x = ConvBN(self.dim, self.local_conv_size, 1, pad, groups=self.dim,
                   dtype=self.dtype, name="local_conv")(x, train)

        h = MlpLN(int(self.dim * self.mlp_ratio), self.dim, dropout=self.drop,
                  dtype=self.dtype, name="mlp")(x, train)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        return x + drop_path(h, self.drop_path_rate, not train, rng)


class TinyViT(nn.Module):
    """Full TinyViT. Input (B, H, W, 3) NHWC; output (B, num_classes) logits."""
    num_classes: int = 1000
    embed_dims: Sequence[int] = (96, 192, 384, 576)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 18)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    remat_stem: bool = False
    # pin each transformer stage's input to the default row-major layout
    # (ops/pallas/layout_pin.py). MEASURED LOSER (6,397 vs 6,996 img/s eval,
    # v5e bs256): XLA re-copies to batch-minor right after the pin — the
    # layout preference lives in the stage GEMM/LN fusions themselves. Kept
    # as an experiment knob; see layout_pin.py for the full verdict.
    pin_layouts: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        total_depth = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total_depth - 1, 1)
               for i in range(total_depth)]

        self.patch_embed = PatchEmbed(self.embed_dims[0], dtype=self.dtype)

        stages = []
        downsamples = []
        for s in range(len(self.depths)):
            base = sum(self.depths[:s])
            blocks = []
            for i in range(self.depths[s]):
                if s == 0:
                    # remat_stem: don't save the 4x-expanded MBConv hiddens
                    # for backward — recompute them. Memory knob for
                    # large-batch/high-res finetune; measured SLOWER at
                    # bs256/224 (1,588 vs 1,695 img/s — the stem bwd is
                    # BN-reduce/layout-bound, not activation-traffic-bound),
                    # so default off. train (arg 2) stays static.
                    cls = nn.remat(MBConv, static_argnums=(2,)) \
                        if self.remat_stem else MBConv
                    blocks.append(cls(self.embed_dims[0],
                                      self.mbconv_expand_ratio, dpr[i],
                                      dtype=self.dtype))
                else:
                    blocks.append(TinyViTBlock(
                        self.embed_dims[s], self.num_heads[s],
                        self.window_sizes[s], self.mlp_ratio, self.drop_rate,
                        dpr[base + i], self.local_conv_size, dtype=self.dtype))
            stages.append(blocks)
            if s < len(self.depths) - 1:
                downsamples.append(PatchMerging(self.embed_dims[s + 1],
                                                dtype=self.dtype))
        self.stages = stages
        self.downsamples = downsamples

        self.norm_head = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=self.dtype,
                                 kernel_init=nn.initializers.truncated_normal(0.02))

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.patch_embed(x, train)
        for s, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x, train)
            if s < len(self.downsamples):
                x = self.downsamples[s](x, train)
                if self.pin_layouts:
                    from cream_tpu.ops.pallas.layout_pin import layout_pin
                    x = layout_pin(x)
        return x

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.forward_features(x, train)
        x = x.mean(axis=(1, 2))                      # global token mean-pool
        x = self.norm_head(x)
        if self.num_classes > 0:
            x = self.head(x)
        return x


_VARIANTS = {
    # name: (embed_dims, depths, num_heads, window_sizes, drop_path)
    # hyperparameters from TinyViT/models/tiny_vit.py:641-703
    "tiny_vit_5m_224": ((64, 128, 160, 320), (2, 2, 6, 2), (2, 4, 5, 10), (7, 7, 14, 7), 0.0),
    "tiny_vit_11m_224": ((64, 128, 256, 448), (2, 2, 6, 2), (2, 4, 8, 14), (7, 7, 14, 7), 0.1),
    "tiny_vit_21m_224": ((96, 192, 384, 576), (2, 2, 6, 2), (3, 6, 12, 18), (7, 7, 14, 7), 0.2),
    "tiny_vit_21m_384": ((96, 192, 384, 576), (2, 2, 6, 2), (3, 6, 12, 18), (12, 12, 24, 12), 0.1),
    "tiny_vit_21m_512": ((96, 192, 384, 576), (2, 2, 6, 2), (3, 6, 12, 18), (16, 16, 32, 16), 0.1),
}


def _make_factory(name, dims, depths, heads, windows, dp):
    def factory(num_classes: int = 1000, drop_path_rate: float | None = None,
                dtype=jnp.float32, **kw):
        return TinyViT(num_classes=num_classes, embed_dims=dims, depths=depths,
                       num_heads=heads, window_sizes=windows,
                       drop_path_rate=dp if drop_path_rate is None else drop_path_rate,
                       dtype=dtype, **kw)
    factory.__name__ = name
    return factory


for _name, (_dims, _depths, _heads, _windows, _dp) in _VARIANTS.items():
    register_model(_make_factory(_name, _dims, _depths, _heads, _windows, _dp))
