"""Depthwise 3x3 conv with a TPU-layout-friendly custom VJP.

Why this exists: XLA's autodiff of `lax.conv_general_dilated` with
`feature_group_count == C` produces a weight-gradient conv that contracts
over the *batch* dimension (activations become the "kernel" of a conv whose
spatial dims are the batch). On TPU that lowering picks batch-minor layouts
and inserts T(4,128) relayout copies of the full activation tensors — at
TinyViT stage-0 train shapes (bs256, 56x56x384 bf16, ~616MB per tensor)
those copies are a measurable slice of the MBConv-stem backward (the
remaining train bottleneck; see CLAUDE.md round-3 notes).

This op keeps the forward exactly as XLA does it (a depthwise
`conv_general_dilated`, NHWC/HWIO) but supplies both gradients in forms
that never contract over batch:

  * dx — a depthwise conv of dy with the spatially-flipped kernel (same
    op class as the forward, so the same good layout).
  * dw — nine shifted elementwise multiply-reduces
    `sum(x_pad[:, kh:kh+H, kw:kw+W, :] * dy)` stacked to (3, 3, 1, C).

MEASURED (v5e, bs256 56x56x384 bf16 — the TinyViT stage-0 shape): XLA does
NOT sibling-fuse the nine shifted reduces — they lower as nine separate
passes over x/dy (12.5 ms isolated vs 5.1 ms for XLA's own batch-group
wgrad conv). Isolated, this formulation LOSES; the open question it exists
to answer is the *full-graph* one — the batch-group conv's
InputBatchInSublanes emitter drags batch-minor layouts into every stem BN
fusion and inserts relayout copies around the attention kernels, so killing
it may win net even though the local op is slower. Gated off
(ConvBN.dw_vjp=False) until the full-train-step A/B says otherwise.

Semantics match `nn.Conv(features=C, kernel_size=(3, 3), strides=1,
padding=1, feature_group_count=C, use_bias=False)` exactly (same HWIO
(3, 3, 1, C) kernel), so modules can swap implementations without touching
the param tree. Reference counterpart: every MBConv dw conv in
TinyViT/models/tiny_vit.py:84-122 (torch Conv2d groups=C).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _dw_fwd_raw(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS,
        feature_group_count=x.shape[-1])


@jax.custom_vjp
def dw_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 stride-1 pad-1 conv, NHWC x (3,3,1,C) -> NHWC."""
    return _dw_fwd_raw(x, w)


def _fwd(x, w):
    return _dw_fwd_raw(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    _, H, W, _ = x.shape
    # dx: correlate dy with the flipped taps — again a plain depthwise conv,
    # no batch contraction anywhere.
    w_flip = jnp.flip(w, axis=(0, 1))
    dx = lax.conv_general_dilated(
        dy, w_flip.astype(dy.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS,
        feature_group_count=dy.shape[-1])
    # dw: nine shifted mul-reduces over (B, H, W), fp32 accumulation.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        jnp.sum(xp[:, kh:kh + H, kw:kw + W, :].astype(jnp.float32)
                * dy.astype(jnp.float32), axis=(0, 1, 2))
        for kh in range(3) for kw in range(3)
    ]
    dw = jnp.stack(taps).reshape(3, 3, 1, x.shape[-1]).astype(w.dtype)
    return dx, dw


dw_conv3x3.defvjp(_fwd, _bwd)


def is_dw3x3(kernel_size: int, stride: int, padding: int, groups: int,
             features: int) -> bool:
    """True when a ConvBN config is the shape this op covers."""
    return (kernel_size == 3 and stride == 1 and padding == 1
            and groups == features)
