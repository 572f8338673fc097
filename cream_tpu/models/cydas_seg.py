"""CyDAS semantic segmentation — the CDARTS segmentation downstream.

Rebuild of CDARTS/CDARTS_segmentation/train/cydas.py (CyDASseg): a
NAS-searched MobileNetV3-family ChildNet backbone (same block vocabulary as
Cream — cydas.py:236-331 `_gen_childnet` with the released
`arch_list = [[0],[3,4,2,0],[5,2,4,0],[4,3,2,2],[1,3,0,1],[2,4,4,2],[0]]`)
feeding a BiSeNet-style aggregation decoder (cydas.py:365-413): 1x1 "arm"
projections down the 1/32 -> 1/16 -> 1/8 path with 3x3 refinements after
each skip concat, a 1x1 feature-fusion, a low-level (1/4) DeepLab-style
decoder head, and two auxiliary heads at 1/16 and 1/32 during training.
Heads wrap a SAGAN-style global self-attention block run at half resolution
(train/att_sa.py Self_Attn + ATT; train/seg_oprs.py Head:236-285,
Decoder:287-345).

TPU design: NHWC throughout; the backbone reuses the Cream InvertedResidual /
DepthwiseSeparable flax blocks (models/cream.py) since the reference builds
both from the same timm-fork builder; every bilinear rescale is a
host-precomputed constant-matrix contraction (ops/resize.py) so the whole
train step stays one fused XLA program with MXU-shaped resizes — the
reference's mix of align_corners=True (attention blocks) and False
(decoder) is preserved exactly. Aux heads run only under ``train=True``;
initialize with train=True so their parameters exist.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from cream_tpu.models.cream import DepthwiseSeparable, InvertedResidual, swish
from cream_tpu.models.registry import register_model
from cream_tpu.nn.layers import ConvBN
from cream_tpu.ops.resize import bilinear_resize

Dtype = Any

# Decoded searched genotype: (out_chs, first-block stride, ((kernel, expand)
# per block)). From cydas.py arch_list + choices_list (k{3,5,7} x e{4,6},
# kernel-major) applied to the arch_def strings (cydas.py:240-282); the
# builder forces stride 1 after each stage's first block
# (builder.py:761-763) and the stage-3 tail string is r2 (two blocks).
CYDAS_STAGES = (
    (24, 2, ((5, 6), (7, 4), (5, 4), (3, 4))),
    (40, 2, ((7, 6), (5, 4), (7, 4), (3, 4))),
    (80, 2, ((7, 4), (5, 6), (5, 4), (5, 4), (5, 4))),
    (96, 1, ((3, 6), (5, 6), (3, 4), (3, 6))),
    (192, 2, ((5, 4), (7, 4), (7, 4), (5, 4))),
)
# channels of the 1/4, 1/8, 1/16, 1/32 feature taps (cydas.py:340, taps at
# block_idxs [1, 2, 4, 6] of [ds, s1..s5, tail] — cydas.py:205)
CYDAS_F_CHANNELS = (24, 40, 96, 320)


class CyDASBackbone(nn.Module):
    """Searched ChildNet trunk returning the four pyramid taps."""
    stages: tuple = CYDAS_STAGES
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple:
        x = ConvBN(16, 3, 2, 1, dtype=self.dtype, name="conv_stem")(x, train)
        x = swish(x)
        x = DepthwiseSeparable(16, dtype=self.dtype, name="blocks_0")(x, train)
        feats = []
        for s, (chs, stride, blocks) in enumerate(self.stages):
            for i, (k, e) in enumerate(blocks):
                x = InvertedResidual(chs, k, e, stride if i == 0 else 1,
                                     dtype=self.dtype,
                                     name=f"stage_{s}_layer_{i}")(x, train)
            if s in (0, 1, 3):
                feats.append(x)
        x = ConvBN(320, 1, dtype=self.dtype, name="blocks_tail")(x, train)
        x = swish(x)
        feats.append(x)
        return tuple(feats)


class ConvNormAct(nn.Module):
    """Reference ConvNorm (operations.py:79-119): conv(no bias)-BN-ReLU."""
    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.features, self.kernel_size, 1, self.kernel_size // 2,
                   dtype=self.dtype, name="conv")(x, train)
        return nn.relu(x)


class SAGANAttention(nn.Module):
    """Reference ATT (att_sa.py:200-231): single-head global attention with
    C/8 query/key projections and a zero-init learnable gate."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="query_conv")(x)
        k = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value_conv")(x)
        q = q.reshape(b, h * w, -1)
        k = k.reshape(b, h * w, -1)
        v = v.reshape(b, h * w, c)
        attn = jax.nn.softmax(jnp.einsum("bid,bjd->bij", q, k), axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class SelfAttnBlock(nn.Module):
    """Reference Self_Attn (att_sa.py:127-198): residual block that runs
    1x1-BN-ReLU -> global attention -> BN-ReLU -> 1x1-BN(zero gamma) at HALF
    resolution (bilinear down/up, align_corners=True) around a projection
    shortcut (1x1-BN-ReLU when channels change, identity otherwise)."""
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, h, w, c = x.shape
        if c != self.dim_out:
            sc = ConvBN(self.dim_out, 1, dtype=self.dtype,
                        name="shortcut")(x, train)
            sc = nn.relu(sc)
        else:
            sc = x
        out = bilinear_resize(x, (h // 2, w // 2), align_corners=True)
        out = ConvBN(self.dim_out, 1, dtype=self.dtype,
                     name="net_proj")(out, train)
        out = nn.relu(out)
        out = SAGANAttention(dtype=self.dtype, name="att")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="net_bn")(out)
        out = nn.relu(out)
        out = ConvBN(self.dim_out, 1, bn_weight_init=0.0, dtype=self.dtype,
                     name="net_out")(out, train)
        out = bilinear_resize(out, (h, w), align_corners=True)
        return nn.relu(out + sc)


def _mid_planes(in_planes: int) -> int:
    """seg_oprs.py:239-251 — halve only past 256 channels."""
    return in_planes if in_planes <= 256 else in_planes // 2


class SegHead(nn.Module):
    """Reference Head (seg_oprs.py:236-285): Self_Attn then 1x1 classifier."""
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = SelfAttnBlock(_mid_planes(x.shape[-1]), dtype=self.dtype,
                          name="att_sa")(x, train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_1x1")(x)


class SegDecoder(nn.Module):
    """Reference Decoder (seg_oprs.py:287-345): project the 1/4 low-level
    feature to 48ch, attend the 1/8 trunk feature, upsample to 1/4
    (align_corners=False), concat, 3x3 fuse, 1x1 classify."""
    num_classes: int
    low_chs: int = 48
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, low: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        low = ConvNormAct(self.low_chs, 1, dtype=self.dtype,
                          name="feature_projection")(low, train)
        mid = _mid_planes(x.shape[-1])
        x = SelfAttnBlock(mid, dtype=self.dtype, name="att_sa")(x, train)
        x = bilinear_resize(x, low.shape[1:3], align_corners=False)
        x = jnp.concatenate([x, low], axis=-1)
        x = ConvBN(mid, 3, 1, 1, dtype=self.dtype, name="conv_3x3")(x, train)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_1x1")(x)


class CyDASSeg(nn.Module):
    """Full model (cydas.py:333-432). Training returns (pred8, pred16,
    pred32) all at input resolution; eval returns pred8 only. ``aux``
    (default: follow ``train``) runs the auxiliary heads independently of
    the BatchNorm mode — parity tests use aux=True with running stats."""
    num_classes: int = 19
    Fch: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 aux: bool | None = None):
        aux = train if aux is None else aux
        h, w = x.shape[1], x.shape[2]
        o4, o8, o16, o32 = CyDASBackbone(dtype=self.dtype,
                                         name="backbone")(x, train)
        f16, f8 = 16 * self.Fch, 8 * self.Fch
        out = ConvNormAct(f16, 1, dtype=self.dtype, name="arms32_0")(o32, train)
        out = bilinear_resize(out, o16.shape[1:3], align_corners=False)
        out = ConvNormAct(f16, 3, dtype=self.dtype, name="refines32_0")(
            jnp.concatenate([out, o16], axis=-1), train)
        out = ConvNormAct(f8, 1, dtype=self.dtype, name="arms32_1")(out, train)
        out = bilinear_resize(out, o8.shape[1:3], align_corners=False)
        out = ConvNormAct(f8, 3, dtype=self.dtype, name="refines32_1")(
            jnp.concatenate([out, o8], axis=-1), train)
        out = ConvNormAct(f8, 1, dtype=self.dtype, name="ffm")(out, train)
        pred8 = SegDecoder(self.num_classes, dtype=self.dtype,
                           name="heads8")(out, o4, train)
        pred8 = bilinear_resize(pred8, (h, w), align_corners=False)
        if not aux:
            return pred8
        pred16 = SegHead(self.num_classes, dtype=self.dtype,
                         name="heads16")(o16, train)
        pred32 = SegHead(self.num_classes, dtype=self.dtype,
                         name="heads32")(o32, train)
        return (pred8,
                bilinear_resize(pred16, (h, w), align_corners=False),
                bilinear_resize(pred32, (h, w), align_corners=False))


@register_model
def cydas_seg(num_classes: int = 19, dtype=jnp.float32, **kw):
    """Cityscapes CyDASseg (Fch=12, the released train_cydas.py config)."""
    return CyDASSeg(num_classes=num_classes, dtype=dtype, **kw)
