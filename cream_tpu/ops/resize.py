"""Bilinear spatial resize as host-precomputed interpolation matrices.

Torch-exact semantics for both conventions the reference mixes inside one
model (CDARTS/CDARTS_segmentation/train/att_sa.py:193-196 uses
align_corners=True; cydas.py:393-431 and seg decoder upsampling use
align_corners=False).

TPU design: output spatial sizes are static under jit, so the two 1-D
interpolation matrices are built host-side with numpy and folded into the
program as constants; the resize itself is two dense contractions
(rows then columns) that lower onto the MXU — no gathers, no dynamic
indexing. This is the same "host precompute + matmul apply" recipe as
zoo/interpolate.py (bicubic checkpoint remapping), but device-side and
differentiable (the VJP of an einsum-with-constant is another einsum).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(out_size: int, in_size: int,
                     align_corners: bool) -> np.ndarray:
    """(out, in) row-stochastic interpolation matrix, torch-exact:
    align_corners=False uses half-pixel centers with the source coordinate
    clamped at 0 (torch upsampling kernel's `area_pixel_compute_source_index`);
    align_corners=True maps endpoints to endpoints."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if align_corners:
            src = 0.0 if out_size == 1 else i * (in_size - 1) / (out_size - 1)
        else:
            src = max((i + 0.5) * in_size / out_size - 0.5, 0.0)
        src = min(src, in_size - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        f = src - lo
        m[i, lo] += 1.0 - f
        m[i, hi] += f
    return m


def bilinear_resize(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Resize NHWC ``x`` to spatial ``out_hw`` with bilinear interpolation."""
    oh, ow = int(out_hw[0]), int(out_hw[1])
    _, h, w, _ = x.shape
    if (oh, ow) == (h, w):
        return x
    mh = jnp.asarray(_bilinear_matrix(oh, h, align_corners), x.dtype)
    mw = jnp.asarray(_bilinear_matrix(ow, w, align_corners), x.dtype)
    x = jnp.einsum("ih,nhwc->niwc", mh, x)
    return jnp.einsum("jw,niwc->nijc", mw, x)
