"""Fused inverted-residual MBConv kernel (TinyViT stage 0 hot spot).

The unfused block (nn/layers.py:MBConv — 1x1 expand -> 3x3 depthwise -> 1x1
project, GELU between, residual + GELU) is HBM-bound at expand_ratio 4: the
(B, 56, 56, 4C) hidden tensor round-trips HBM around four times (CLAUDE.md
perf notes). Here one pallas_call keeps the hidden activation entirely in
VMEM per image: expand matmul (MXU), nine shifted multiply-adds for the
depthwise conv (VPU), project matmul (MXU), residual + GELU — HBM traffic
collapses to read x + write y.

BN is folded into the conv weights on the fly (inference path only; the
training path keeps the reference module so batch statistics update).
GELU uses the tanh form in fp32 scratch — same numerics as nn/act.py under
bf16 (sub-rounding-error vs exact erf, CLAUDE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2_OVER_PI = 0.7978845608028654


def _gelu(x, exact: bool):
    """fp32 GELU: exact erf form for fp32 models, tanh form under bf16 —
    the same dtype policy as nn/act.py."""
    if exact:
        return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI
                                     * (x + 0.044715 * x * x * x)))


def _kernel(x_ref, w1_ref, b1_ref, dw_ref, bdw_ref, w2_ref, b2_ref, out_ref,
            *, H: int, W: int, C: int, HID: int, exact: bool):
    x = x_ref[0]                                            # (H, W, C)
    h = jnp.dot(x.reshape(H * W, C), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[...], exact)
    h = h.astype(x.dtype).reshape(H, W, HID)

    hp = jnp.pad(h, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H, W, HID), jnp.float32) + bdw_ref[...]
    for dy in range(3):
        for dx in range(3):
            acc += (hp[dy:dy + H, dx:dx + W, :].astype(jnp.float32)
                    * dw_ref[dy, dx, :])
    h2 = _gelu(acc, exact).astype(x.dtype)

    y = jnp.dot(h2.reshape(H * W, HID), w2_ref[...],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[...] + x.reshape(H * W, C).astype(jnp.float32)
    out_ref[0] = _gelu(y, exact).reshape(H, W, C).astype(out_ref.dtype)


def supports_shape(H: int, W: int, C: int, expand_ratio: float,
                   dtype) -> bool:
    """VMEM budget: hidden (H, W, 4C) needs ~3 live copies (bf16 x2 + fp32
    accumulator). Gate well under the ~16 MB VMEM."""
    hid = int(C * expand_ratio)
    itemsize = jnp.dtype(dtype).itemsize
    hidden_bytes = H * W * hid * (2 * itemsize + 4)
    return hidden_bytes < 11 * 2 ** 20 and hid % 128 == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mbconv(x: jnp.ndarray, w1, b1, dw, bdw, w2, b2,
                 interpret: bool = False) -> jnp.ndarray:
    """x (B, H, W, C); w1 (C, HID); dw (3, 3, HID); w2 (HID, C); biases
    fp32. BN pre-folded by the caller. Returns (B, H, W, C)."""
    B, H, W, C = x.shape
    HID = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, HID=HID,
                          exact=x.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HID), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, HID), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, b1, dw, bdw, w2, b2)


def fold_convbn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """ConvBN (no conv bias) -> (folded_kernel, folded_bias), fp32."""
    f = scale * jax.lax.rsqrt(var + eps)
    return kernel * f, bias - mean * f


def fold_mbconv_variables(v: dict, compute_dtype):
    """MBConv submodule variables (conv1/conv2/conv3 ConvBN children) ->
    the seven fused-kernel operands."""
    p, s = v["params"], v["batch_stats"]

    def fold(name):
        k, b = fold_convbn(p[name]["conv"]["kernel"].astype(jnp.float32),
                           p[name]["bn"]["scale"].astype(jnp.float32),
                           p[name]["bn"]["bias"].astype(jnp.float32),
                           s[name]["bn"]["mean"].astype(jnp.float32),
                           s[name]["bn"]["var"].astype(jnp.float32))
        return k, b

    k1, b1 = fold("conv1")                 # (1, 1, C, HID)
    kd, bd = fold("conv2")                 # (3, 3, 1, HID) depthwise
    k2, b2 = fold("conv3")                 # (1, 1, HID, C)
    w1 = k1.reshape(k1.shape[2], k1.shape[3]).astype(compute_dtype)
    dw = kd.reshape(3, 3, kd.shape[3]).astype(jnp.float32)
    w2 = k2.reshape(k2.shape[2], k2.shape[3]).astype(compute_dtype)
    return w1, b1, dw, bd, w2, b2
