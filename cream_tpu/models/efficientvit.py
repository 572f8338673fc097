"""EfficientViT — throughput-optimized 3-stage pyramid with cascaded group attention.

TPU-native rebuild of EfficientViT/classification/model/efficientvit.py (M0-M5
configs at classification/model/build.py:10-68). Everything is Conv+BN (no
LayerNorm except none at all), NHWC:

  patch_embed: four stride-2 Conv3x3+BN with ReLU between (16x reduction)
  stage: [EfficientViTBlock x depth]; between stages a sandwich of
         (dw-conv residual + FFN residual) -> PatchMerging(SE) ->
         (dw-conv residual + FFN residual) at the new width
  EfficientViTBlock: dw-conv residual, FFN residual, window cascaded group
         attention residual, dw-conv residual, FFN residual
  head: BatchNorm1d + Linear on the mean-pooled feature map

CascadedGroupAttention (reference :104-181): the input channels are split
across heads; each head's qkv conv consumes its chunk PLUS the previous
head's output (the cascade), q gets a per-head depthwise conv, attention uses
a trained per-offset bias table. The head loop is a short unrolled chain of
small MXU matmuls; window tokens (49/16) are flattened into the batch so each
einsum is one large batched GEMM.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cream_tpu.models.registry import register_model
from cream_tpu.nn.layers import ConvBN, BNLinear
from cream_tpu.ops.common import attention_bias_indices
from cream_tpu.ops.window import window_partition, window_reverse

Dtype = Any


class SqueezeExcite(nn.Module):
    """timm-style SE: pool -> 1x1 reduce -> ReLU -> 1x1 expand -> sigmoid gate."""
    rd_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        rd = max(1, round(c * self.rd_ratio))
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(rd, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class FFN(nn.Module):
    """1x1 ConvBN -> ReLU -> 1x1 ConvBN (bn gamma init 0)."""
    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.hidden, 1, dtype=self.dtype, name="pw1")(x, train)
        x = nn.relu(x)
        x = ConvBN(self.dim, 1, bn_weight_init=0.0, dtype=self.dtype, name="pw2")(x, train)
        return x


class PatchMerging(nn.Module):
    """1x1 expand(4x) -> 3x3 dw stride-2 -> SE -> 1x1 project, ReLU between."""
    dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hid = int(self.dim * 4)
        x = ConvBN(hid, 1, dtype=self.dtype, name="conv1")(x, train)
        x = nn.relu(x)
        x = ConvBN(hid, 3, 2, 1, groups=hid, dtype=self.dtype, name="conv2")(x, train)
        x = nn.relu(x)
        x = SqueezeExcite(dtype=self.dtype, name="se")(x)
        x = ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x, train)
        return x


class CascadedGroupAttention(nn.Module):
    """Per-head chunked input with cascaded feature refinement and bias tables."""
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    kernels: Sequence[int]
    dtype: Dtype = jnp.float32

    # Fused kernel exists (ops/pallas/cga.py, bit-exact) but is OFF: at the
    # M0 stage-0 shape (4096 windows of 7x7) it measures 5.76 ms vs 3.46 ms
    # for this XLA path — the per-window (64, 16) attention dots become 32k
    # sequential tiny MXU ops inside one kernel, while XLA at least overlaps
    # them with HBM traffic. See ops/pallas/cga.py docstring for the full
    # apportionment.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = self.num_heads
        kd = self.key_dim
        d = int(self.attn_ratio * kd)
        N = H * W
        idxs, n_off = attention_bias_indices((self.resolution, self.resolution))
        assert N == idxs.shape[0]
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (h, n_off), jnp.float32)
        bias_tab = biases[:, idxs]                     # (h, N, N)

        if self.use_pallas and not train and not self.is_initializing():
            from cream_tpu.nn.attention import _on_tpu
            from cream_tpu.ops.pallas.cga import (fold_cga_variables,
                                                  fused_cga, supports_shape)
            c_in = C // h
            ks_max = max(self.kernels[:h])
            if (_on_tpu() and H == W and H == self.resolution
                    and supports_shape(B, H)
                    and "batch_stats" in self.variables):
                ops = fold_cga_variables(self.variables, h, kd, d, ks_max,
                                         self.dtype)
                wqkv, bqkv, dwk, dwb, wproj, bproj = ops
                return fused_cga(x, biases, idxs, wqkv, bqkv, dwk, dwb,
                                 wproj, bproj, ws=H, heads=h, c_in=c_in,
                                 kd=kd, d=d, ks_max=ks_max)

        # Attention-core Pallas kernel (eval only): score/bias/softmax/PV per
        # head as one windows-packed GEMM chain — the convs of the cascade
        # stay in XLA. See ops/pallas/cga_core.py for the measured rationale.
        use_core = False
        if not train and not self.is_initializing():
            from cream_tpu.nn.attention import _on_tpu
            from cream_tpu.ops.pallas import cga_core
            use_core = (cga_core.DEFAULT_CORE_KERNEL and _on_tpu()
                        and cga_core.supports(B, N))

        chunks = jnp.split(x, h, axis=-1)
        feat = chunks[0]
        outs = []
        for i in range(h):
            if i > 0:
                feat = feat + chunks[i]
            qkv = ConvBN(2 * kd + d, 1, dtype=self.dtype, name=f"qkv_{i}")(feat, train)
            q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
            ks = self.kernels[i]
            q = ConvBN(kd, ks, 1, ks // 2, groups=kd, dtype=self.dtype,
                       name=f"dw_{i}")(q, train)
            q = q.reshape(B, N, kd)
            k = k.reshape(B, N, kd)
            v = v.reshape(B, N, d)
            if use_core:
                from cream_tpu.ops.pallas import cga_core
                feat = cga_core.cga_attention(q, k, v, bias_tab[i],
                                              kd ** -0.5).reshape(B, H, W, d)
            else:
                attn = jnp.einsum("bnk,bmk->bnm", q, k,
                                  preferred_element_type=jnp.float32) * (kd ** -0.5)
                attn = attn + bias_tab[i][None].astype(attn.dtype)
                # softmax restructured for HBM traffic (round-5 M0 profile:
                # the per-head softmax kOutput fusions were the top bucket,
                # 0.52 ms each, shipping exp'd scores AND a rowsum to HBM in
                # fp32): scores cross HBM once in the compute dtype, the
                # max-sub/exp fuses into the PV GEMM (XLA folds it into the
                # kOutput fusion so probs never materialize), and the rowsum
                # rides the PV GEMM as an appended ones-column — division
                # deferred to the (B,N,d+1) tile. Measured on M0 bs1024:
                # 9.96 -> 8.38 ms op time (107.0k -> 125.3k img/s with f32
                # scores; bf16 score storage below trims the exp+PV read).
                attn = attn.astype(self.dtype)
                p = jnp.exp((attn - jax.lax.stop_gradient(
                    attn.max(axis=-1, keepdims=True))).astype(jnp.float32)
                    ).astype(self.dtype)
                v1 = jnp.concatenate(
                    [v, jnp.ones((B, N, 1), v.dtype)], axis=-1)
                o = jnp.einsum("bnm,bmd->bnd", p, v1,
                               preferred_element_type=jnp.float32)
                feat = (o[..., :d] / o[..., d:]).astype(
                    self.dtype).reshape(B, H, W, d)
            outs.append(feat)
        x = nn.relu(jnp.concatenate(outs, axis=-1))
        return ConvBN(self.dim, 1, bn_weight_init=0.0, dtype=self.dtype,
                      name="proj")(x, train)


class LocalWindowAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    window_resolution: int
    kernels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        H, W = x.shape[1], x.shape[2]
        # adapt to the actual feature size (reference asserts H==resolution;
        # we instead let smaller inputs shrink the window, like TinyViT does)
        ws = min(self.window_resolution, self.resolution, H, W)
        attn = CascadedGroupAttention(self.dim, self.key_dim, self.num_heads,
                                      self.attn_ratio, ws, self.kernels,
                                      dtype=self.dtype, name="attn")
        if H <= ws and W <= ws:
            return attn(x, train)
        wx, padded = window_partition(x, ws)
        n_win = wx.shape[0]
        wx = attn(wx.reshape(n_win, ws, ws, -1), train)
        return window_reverse(wx.reshape(n_win, ws * ws, -1), ws, padded, (H, W))


class EfficientViTBlock(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    window_resolution: int
    kernels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x + ConvBN(self.dim, 3, 1, 1, groups=self.dim, bn_weight_init=0.0,
                       dtype=self.dtype, name="dw0")(x, train)
        x = x + FFN(self.dim, int(self.dim * 2), dtype=self.dtype, name="ffn0")(x, train)
        x = x + LocalWindowAttention(self.dim, self.key_dim, self.num_heads,
                                     self.attn_ratio, self.resolution,
                                     self.window_resolution, self.kernels,
                                     dtype=self.dtype, name="mixer")(x, train)
        x = x + ConvBN(self.dim, 3, 1, 1, groups=self.dim, bn_weight_init=0.0,
                       dtype=self.dtype, name="dw1")(x, train)
        x = x + FFN(self.dim, int(self.dim * 2), dtype=self.dtype, name="ffn1")(x, train)
        return x


class Subsample(nn.Module):
    """The downsample sandwich between stages: local conv + FFN residuals at the
    old width, PatchMerging, then local conv + FFN residuals at the new width."""
    dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x + ConvBN(self.dim, 3, 1, 1, groups=self.dim, dtype=self.dtype,
                       name="pre_dw")(x, train)
        x = x + FFN(self.dim, int(self.dim * 2), dtype=self.dtype, name="pre_ffn")(x, train)
        x = PatchMerging(self.dim, self.out_dim, dtype=self.dtype, name="merge")(x, train)
        x = x + ConvBN(self.out_dim, 3, 1, 1, groups=self.out_dim, dtype=self.dtype,
                       name="post_dw")(x, train)
        x = x + FFN(self.out_dim, int(self.out_dim * 2), dtype=self.dtype,
                    name="post_ffn")(x, train)
        return x


class EfficientViT(nn.Module):
    """Input (B, H, W, 3) NHWC -> (B, num_classes) logits."""
    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    embed_dim: Sequence[int] = (64, 128, 192)
    key_dim: Sequence[int] = (16, 16, 16)
    depth: Sequence[int] = (1, 2, 3)
    num_heads: Sequence[int] = (4, 4, 4)
    window_size: Sequence[int] = (7, 7, 7)
    kernels: Sequence[int] = (5, 5, 5, 5)
    distillation: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        ed = self.embed_dim
        self.patch_embed = [
            ConvBN(ed[0] // 8, 3, 2, 1, dtype=self.dtype),
            ConvBN(ed[0] // 4, 3, 2, 1, dtype=self.dtype),
            ConvBN(ed[0] // 2, 3, 2, 1, dtype=self.dtype),
            ConvBN(ed[0], 3, 2, 1, dtype=self.dtype),
        ]
        resolution = self.img_size // self.patch_size
        stages = []
        subsamples = []
        for i in range(len(ed)):
            ar = ed[i] / (self.key_dim[i] * self.num_heads[i])
            stages.append([
                EfficientViTBlock(ed[i], self.key_dim[i], self.num_heads[i],
                                  ar, resolution, self.window_size[i],
                                  self.kernels, dtype=self.dtype)
                for _ in range(self.depth[i])])
            if i < len(ed) - 1:
                subsamples.append(Subsample(ed[i], ed[i + 1], dtype=self.dtype))
                resolution = (resolution - 1) // 2 + 1
        self.stages = stages
        self.subsamples = subsamples
        self.head = BNLinear(self.num_classes, dtype=self.dtype)
        if self.distillation:
            self.head_dist = BNLinear(self.num_classes, dtype=self.dtype)

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, pe in enumerate(self.patch_embed):
            x = pe(x, train)
            if i < 3:
                x = nn.relu(x)
        for i, stage in enumerate(self.stages):
            for blk in stage:
                x = blk(x, train)
            if i < len(self.subsamples):
                x = self.subsamples[i](x, train)
        return x

    def forward_pyramid(self, x: jnp.ndarray, train: bool = False) -> tuple:
        """Per-stage feature maps (strides 16/32/64) for detection necks —
        the downstream backbone contract (EfficientViT/downstream/
        efficientvit.py:433-441: outs collected after each stage's blocks,
        before the next subsample)."""
        for i, pe in enumerate(self.patch_embed):
            x = pe(x, train)
            if i < 3:
                x = nn.relu(x)
        outs = []
        for i, stage in enumerate(self.stages):
            for blk in stage:
                x = blk(x, train)
            outs.append(x)
            if i < len(self.subsamples):
                x = self.subsamples[i](x, train)
        return tuple(outs)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.forward_features(x, train)
        x = x.mean(axis=(1, 2))
        if self.distillation:
            logits = self.head(x, train)
            logits_dist = self.head_dist(x, train)
            if train:
                return logits, logits_dist
            return (logits + logits_dist) / 2
        return self.head(x, train)


# M0-M5 configs from EfficientViT/classification/model/build.py:10-68
_CONFIGS = {
    "efficientvit_m0": dict(embed_dim=(64, 128, 192), depth=(1, 2, 3),
                            num_heads=(4, 4, 4), kernels=(5, 5, 5, 5)),
    "efficientvit_m1": dict(embed_dim=(128, 144, 192), depth=(1, 2, 3),
                            num_heads=(2, 3, 3), kernels=(7, 5, 3, 3)),
    "efficientvit_m2": dict(embed_dim=(128, 192, 224), depth=(1, 2, 3),
                            num_heads=(4, 3, 2), kernels=(7, 5, 3, 3)),
    "efficientvit_m3": dict(embed_dim=(128, 240, 320), depth=(1, 2, 3),
                            num_heads=(4, 3, 4), kernels=(5, 5, 5, 5)),
    "efficientvit_m4": dict(embed_dim=(128, 256, 384), depth=(1, 2, 3),
                            num_heads=(4, 4, 4), kernels=(7, 5, 3, 3)),
    "efficientvit_m5": dict(embed_dim=(192, 288, 384), depth=(1, 3, 4),
                            num_heads=(3, 3, 4), kernels=(7, 5, 3, 3)),
}


def _make_factory(name, cfg):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kw):
        return EfficientViT(num_classes=num_classes, dtype=dtype, **cfg, **kw)
    factory.__name__ = name
    return factory


for _name, _cfg in _CONFIGS.items():
    register_model(_make_factory(_name, _cfg))
