"""Pallas TPU kernel: window bias-attention directly on the NHWC qkv tensor.

Motivation (measured on v5e, TinyViT-21M stage-1 shapes, bs 256, random data):
the attention math itself is cheap but composing it with `window_partition` /
head transposes makes XLA's layout assignment propagate the transpose into
every neighbouring op — LayerNorm and the qkv/proj Dense lower to batch-minor
convolutions with T(4,128) copies, and the block costs 11-13 ms instead of
~2 ms. The fix is architectural: never transpose in HBM.

This kernel takes the qkv projection output in its native (B, H, W, L) layout
(L = lane-packed q/k/v for all heads, exactly how the fused qkv Dense emits
it), performs the windowing through BlockSpec index maps (DMA does the
gather), and writes the attended output back as (B, H, W, heads*dv), ready
for the output projection. Per (image, window-row) program:

    for each window j, head h:
        q, k, v = lane slices of the window's qkv block
        out[h] = softmax(q @ k^T * scale + bias[h] (+ mask[j])) @ v   (fp32)

Two lane packings are supported, matching the two reference projection
conventions:
  - "head_major": [q_h | k_h | v_h] per head (TinyViT/LeViT qkv,
    TinyViT/models/tiny_vit.py:216-286)
  - "qkv_major":  [q all heads | k all heads | v all heads] (Swin-lineage
    reshape(B, N, 3, h, d), AutoFormerV2/model/SSS.py:58-140)

The optional additive mask ((nH*nW, N, N), fp32) implements Swin's
shifted-window masking; it is indexed per window position via the grid.

Window token counts are small (16..256), so everything for a row of windows
fits VMEM; the (N, N) attention matrices never exist in HBM at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _offsets(layout: str, heads: int, kd: int, dv: int):
    if layout == "head_major":
        return [(h * (2 * kd + dv), h * (2 * kd + dv) + kd,
                 h * (2 * kd + dv) + 2 * kd) for h in range(heads)]
    if layout == "qkv_major":
        return [(h * kd, heads * kd + h * kd, 2 * heads * kd + h * dv)
                for h in range(heads)]
    raise ValueError(f"unknown qkv layout: {layout}")


def _kernel(qkv_ref, bias_ref, *rest, ws: int, n_win: int, heads: int,
            kd: int, dv: int, scale: float, has_mask: bool, offs):
    if has_mask:
        mask_ref, out_ref = rest
    else:
        (out_ref,) = rest
    for j in range(n_win):
        # (ws, ws, L) -> (N, L): Mosaic can't shape-cast a sublane-dim merge,
        # so stack the window's rows along sublanes explicitly.
        x = jnp.concatenate(
            [qkv_ref[0, r, j * ws:(j + 1) * ws, :] for r in range(ws)], axis=0)
        outs = []
        for h in range(heads):
            qo, ko, vo = offs[h]
            q = x[:, qo:qo + kd]
            k = x[:, ko:ko + kd]
            v = x[:, vo:vo + dv]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h]
            if has_mask:
                s = s + mask_ref[j]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o.astype(out_ref.dtype))
        o = jnp.concatenate(outs, axis=-1)                  # (N, heads*dv)
        for r in range(ws):
            out_ref[0, r, j * ws:(j + 1) * ws, :] = o[r * ws:(r + 1) * ws, :]




@functools.partial(jax.jit, static_argnames=("window", "heads", "kd", "dv",
                                             "layout", "interpret"))
def fused_window_attention(qkv: jnp.ndarray, bias: jnp.ndarray,
                           mask: jnp.ndarray | None = None, *,
                           window: int, heads: int, kd: int, dv: int,
                           layout: str = "head_major",
                           interpret: bool = False) -> jnp.ndarray:
    """Windowed multi-head bias-attention without any HBM transpose.

    qkv:  (B, H, W, heads*(2*kd+dv)) — fused qkv projection output, lanes
          packed per `layout`. H and W must be multiples of `window`
          (callers pad; padded windows are self-contained garbage that the
          caller crops, matching reference zero-pad semantics).
    bias: (heads, N, N) fp32 per-offset attention bias, N = window**2.
    mask: optional (nH*nW, N, N) fp32 additive mask per window position
          (Swin shifted windows).
    Returns (B, H, W, heads*dv).
    """
    B, H, W, L = qkv.shape
    assert H % window == 0 and W % window == 0, (H, W, window)
    assert L == heads * (2 * kd + dv), (L, heads, kd, dv)
    N = window * window
    assert bias.shape == (heads, N, N), (bias.shape, heads, N)
    nH, nW = H // window, W // window
    scale = kd ** -0.5

    # one program per (image, window-row): a row of nW windows amortizes the
    # unrolled per-head dots while staying well under VMEM (worst shipped
    # shape: 16x(16,16) windows of 576 lanes ~ 4.7 MB with double buffering).
    grid = (B, nH)
    in_specs = [
        pl.BlockSpec((1, window, W, L), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, N, N), lambda b, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, bias.astype(jnp.float32)]
    if mask is not None:
        assert mask.shape == (nH * nW, N, N), (mask.shape, nH, nW, N)
        in_specs.append(pl.BlockSpec((nW, N, N), lambda b, i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32))

    return pl.pallas_call(
        functools.partial(_kernel, ws=window, n_win=nW, heads=heads, kd=kd,
                          dv=dv, scale=scale, has_mask=mask is not None,
                          offs=tuple(_offsets(layout, heads, kd, dv))),
        out_shape=jax.ShapeDtypeStruct((B, H, W, heads * dv), qkv.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, window, W, heads * dv),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
