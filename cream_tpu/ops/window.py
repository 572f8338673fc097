"""Window partition / reverse for local attention, NHWC layout.

Semantics match the reference's window partitioning used across TinyViT
(TinyViT/models/tiny_vit.py:344-370), EfficientViT
(EfficientViT/classification/model/efficientvit.py:220-246) and Swin-lineage
models: pad bottom/right to a window multiple, tile into (ws, ws) windows,
attend per window, reverse, crop the padding.

TPU notes: all shapes are static under jit; the reshape/transpose pair lowers
to cheap layout ops. NHWC is the native TPU conv layout so no NCHW permutes
are ever needed around these calls.
"""
from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window: int) -> tuple[jnp.ndarray, tuple[int, int]]:
    """(B, H, W, C) -> (B * nH * nW, window*window, C).

    Pads H/W up to multiples of `window` with zeros. Returns the padded (pH, pW)
    so the caller can reverse.
    """
    B, H, W, C = x.shape
    pad_b = (-H) % window
    pad_r = (-W) % window
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    pH, pW = H + pad_b, W + pad_r
    nH, nW = pH // window, pW // window
    x = x.reshape(B, nH, window, nW, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * nH * nW, window * window, C)
    return x, (pH, pW)


def window_reverse(windows: jnp.ndarray, window: int, padded_hw: tuple[int, int],
                   out_hw: tuple[int, int]) -> jnp.ndarray:
    """Inverse of window_partition; crops back to out_hw. Returns (B, H, W, C)."""
    pH, pW = padded_hw
    H, W = out_hw
    nH, nW = pH // window, pW // window
    C = windows.shape[-1]
    B = windows.shape[0] // (nH * nW)
    x = windows.reshape(B, nH, nW, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
    if pH != H or pW != W:
        x = x[:, :H, :W, :]
    return x
