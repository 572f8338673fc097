"""layout_pin: force a tensor onto the default TPU layout ({3,2,1,0} row-major)
at a chosen graph point, as a Pallas identity kernel.

Why this exists (measured, TinyViT-21M bs256 v5e, round-4 xplane traces): the
convolutional stem / PatchMerging layers lower with batch-minor layouts
({0,3,2,1} / {3,0,2,1}); XLA's layout assignment propagates that preference
into the transformer stages, where every fused window-attention custom-call
requires default-layout operands. The result is a pair of relayout copies
around EVERY attention kernel (0.83 ms each on the stage-1 qkv tensor) plus
batch-minor LayerNorm reduces. Pinning the stage INPUT to row-major moves the
one unavoidable relayout to the (cheaper) stage-boundary tensor and lets the
whole residual stream stay row-major.

The backward is a plain identity (no pin): cotangents flow into the conv stem
whose ops prefer batch-minor — forcing a layout there would just add a pass.

MEASURED VERDICT (v5e, TinyViT-21M bs256 eval, round 4): pinning every stage
input LOSES — 6,397 vs 6,996 img/s un-pinned. XLA's preference for
batch-minor layouts on these stage tensors comes from the GEMM/LN fusions
themselves, not only from upstream propagation, so the pin does not flip the
stage row-major: XLA re-copies right after it and the pin is a pure extra
pass. Kept for experiments (TinyViT.pin_layouts stays default-off); the win
that DID land from the same diagnosis is the in-kernel qkv-bias fold
(fused_window_attention qkv_bias=..., +6% eval).

Reference counterpart: none — this is a TPU-specific graph annotation; the
CUDA reference (TinyViT/models/tiny_vit.py) has no analogous concern.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...]


def _pin(x, interpret):
    B = x.shape[0]
    rest = x.shape[1:]
    blk = (1,) + rest
    nd = len(rest)
    return pl.pallas_call(
        _copy_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(blk, lambda b: (b,) + (0,) * nd,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, lambda b: (b,) + (0,) * nd,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def layout_pin(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Identity; on TPU, forces `x` into the default row-major layout."""
    if not interpret and jax.default_backend() in ("cpu", "gpu"):
        return x
    return _pin(x, interpret)


def _fwd(x, interpret):
    return layout_pin(x, interpret), None


def _bwd(interpret, _, dy):
    return (dy,)


layout_pin.defvjp(_fwd, _bwd)
