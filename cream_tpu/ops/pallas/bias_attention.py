"""Pallas TPU kernel: fused window attention with a per-offset bias table.

The hot op of TinyViT/EfficientViT/Swin eval (SURVEY.md §7 'Per-offset
attention-bias tables in Pallas'): for every (window, head),
    out = softmax(q @ k^T * scale + bias[head]) @ v
Window token counts are small (16..196), so the win is NOT flash-style
streaming — it is fusing the three stages so the (windows, heads, N, N)
attention matrix never round-trips HBM (at batch 256 that matrix is >150 MB
per TinyViT stage in fp32).

Grid: (window_tiles, heads). Each program holds a (TILE_W, N, d) q/k/v block
and the head's (N, N) bias in VMEM and runs batched MXU matmuls.

The jnp path in nn/attention.py remains the autodiff path and the test
oracle; this kernel is used for inference (wired via BiasAttention use_pallas).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float,
            tile_w: int):
    # statically-unrolled 2D dots per window: Mosaic compiles plain (N, d)
    # matmuls orders of magnitude faster than batched 3D dot_generals.
    # Inputs stay in their native dtype (bf16 rides the MXU at full rate);
    # accumulation and softmax run in fp32.
    bias = bias_ref[0].astype(jnp.float32)       # (N, N)
    for t in range(tile_w):
        q = q_ref[t, 0]                          # (N, dk) native dtype
        k = k_ref[t, 0]
        v = v_ref[t, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[t, 0] = o.astype(out_ref.dtype)


def supports_shape(N: int) -> bool:
    """Use the fused kernel only where it beats XLA (measured on v5e):
    small windows (N<=128), where HBM round-trips of the attention matrix
    dominate. At N=196 XLA's batched bf16 GEMMs win — the per-window 2D dots
    under-fill the MXU and lane padding (196->256) wastes 30% compute."""
    return N <= 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bias_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray, interpret: bool = False
                         ) -> jnp.ndarray:
    """q,k: (W, h, N, dk); v: (W, h, N, dv); bias: (h, N, N) -> (W, h, N, dv).

    Scale is dk**-0.5 (applied inside). W is padded to the window tile.

    Token counts over 128 are padded up to a lane multiple (padded key columns
    get -1e9 bias so softmax ignores them; padded query rows are sliced off).
    Without this, Mosaic compile time explodes on misaligned N (N=196 took
    minutes; padded to 256 it compiles in ~1s).
    """
    W, h, N, dk = q.shape
    dv = v.shape[-1]
    scale = dk ** -0.5

    N_orig = N
    if N > 128 and N % 128 != 0:
        Np = (-(-N // 128)) * 128
        padn = Np - N
        q = jnp.pad(q, ((0, 0), (0, 0), (0, padn), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, padn), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, padn), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, padn), (0, padn)),
                       constant_values=-1e9)
        N = Np

    # pick a window tile that keeps several windows per program without
    # overflowing VMEM. Account for TPU tiling: sublanes pad to 8, lanes to
    # 128; ~3 padded qkv blocks + ~4 (N, N) temporaries, x2 for pipelining.
    def _pad(a, m):
        return -(-a // m) * m
    n_sub, n_lane = _pad(N, 8), _pad(N, 128)
    d_lane = _pad(max(dk, dv), 128)
    bytes_per_w = (3 * n_sub * d_lane + 4 * n_sub * n_lane) * 4 * 2
    tile_w = max(1, min(W, int(6e6) // bytes_per_w, 8))
    pad = (-W) % tile_w
    if pad:
        zq = jnp.zeros((pad, h, N, dk), q.dtype)
        q = jnp.concatenate([q, zq], 0)
        k = jnp.concatenate([k, zq], 0)
        v = jnp.concatenate([v, jnp.zeros((pad, h, N, dv), v.dtype)], 0)
    Wp = q.shape[0]

    grid = (Wp // tile_w, h)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((Wp, h, N, dv), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_w, 1, N, dk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, 1, N, dk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, 1, N, dv), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_w, 1, N, dv), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:W, :, :N_orig]
