"""Pallas TPU kernels: window partition/reverse as layout-pinned block moves.

Why these exist: the jnp window partition (reshape-transpose-reshape,
ops/window.py) is itself cheap, but under whole-program compilation XLA's
layout assignment makes the transpose "free" by assigning transposed layouts
to its producers/consumers — LayerNorm and the qkv/proj projections around the
window attention then lower to batch-minor convolutions with T(4,128) copies
(measured 11-13 ms vs ~1.5 ms for TinyViT-21M stage 1, bs 256 on v5e).

A Pallas custom call pins default layouts on its operands and results, so
doing the windowing as a kernel quarantines the relayout: everything upstream
and downstream keeps clean layouts and XLA's batched attention GEMMs run at
full speed. The kernels are pure DMA block moves (sublane slices only, lanes
untouched) and run at HBM bandwidth.

Semantics match ops/window.py (reference TinyViT/models/tiny_vit.py:344-370):
callers pad H/W to window multiples first.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _part_kernel(x_ref, o_ref, *, ws: int, n_win: int):
    for j in range(n_win):
        o_ref[j] = x_ref[0, :, j * ws:(j + 1) * ws, :]


def _rev_kernel(x_ref, o_ref, *, ws: int, n_win: int):
    for j in range(n_win):
        o_ref[0, :, j * ws:(j + 1) * ws, :] = x_ref[j]


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def window_partition_pallas(x: jnp.ndarray, window: int,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, window*window, C); H, W multiples of window."""
    B, H, W, C = x.shape
    assert H % window == 0 and W % window == 0, (H, W, window)
    nH, nW = H // window, W // window
    out = pl.pallas_call(
        functools.partial(_part_kernel, ws=window, n_win=nW),
        out_shape=jax.ShapeDtypeStruct((B * nH * nW, window, window, C),
                                       x.dtype),
        grid=(B, nH),
        in_specs=[pl.BlockSpec((1, window, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nW, window, window, C),
                               lambda b, i: (b * nH + i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    # adjacent-dim merge on a default layout is a bitcast
    return out.reshape(B * nH * nW, window * window, C)


@functools.partial(jax.jit, static_argnames=("window", "hw", "interpret"))
def window_reverse_pallas(windows: jnp.ndarray, window: int,
                          hw: tuple[int, int],
                          interpret: bool = False) -> jnp.ndarray:
    """(B*nH*nW, window*window, C) -> (B, H, W, C). Inverse of partition."""
    H, W = hw
    nH, nW = H // window, W // window
    Wn, N, C = windows.shape
    assert N == window * window and Wn % (nH * nW) == 0, (windows.shape, hw)
    B = Wn // (nH * nW)
    x = windows.reshape(Wn, window, window, C)
    return pl.pallas_call(
        functools.partial(_rev_kernel, ws=window, n_win=nW),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B, nH),
        in_specs=[pl.BlockSpec((nW, window, window, C),
                               lambda b, i: (b * nH + i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, window, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
