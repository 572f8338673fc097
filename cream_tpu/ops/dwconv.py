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

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _dx_xla(dy, w):
    """dx as a plain depthwise conv of dy with the flipped taps — the same op
    class as the forward, so the same good layout; no batch contraction."""
    w_flip = jnp.flip(w, axis=(0, 1))
    return lax.conv_general_dilated(
        dy, w_flip.astype(dy.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS,
        feature_group_count=dy.shape[-1])


def _dw_9shift(x, dy):
    """dw as nine shifted mul-reduces over (B, H, W), fp32 accumulation."""
    _, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        jnp.sum(xp[:, kh:kh + H, kw:kw + W, :].astype(jnp.float32)
                * dy.astype(jnp.float32), axis=(0, 1, 2))
        for kh in range(3) for kw in range(3)
    ]
    return jnp.stack(taps).reshape(3, 3, 1, x.shape[-1])


def _bwd(res, dy):
    x, w = res
    return _dx_xla(dy, w), _dw_9shift(x, dy).astype(w.dtype)


dw_conv3x3.defvjp(_fwd, _bwd)


# Module default for ConvBN.dw_vjp=None sites (flip for A/B measurements or
# set True globally once the full-train-step verdict is in).
DEFAULT_DW_VJP = False


def default_dw_vjp() -> bool:
    return DEFAULT_DW_VJP


def is_dw3x3(kernel_size: int, stride: int, padding: int, groups: int,
             features: int) -> bool:
    """True when a ConvBN config is the shape this op covers."""
    return (kernel_size == 3 and stride == 1 and padding == 1
            and groups == features)


def is_dw3x3_any(kernel_size: int, stride: int, padding: int, groups: int,
                 features: int) -> bool:
    """dw 3x3 pad-1, stride 1 or 2 — the two shapes the fused family covers."""
    return (kernel_size == 3 and stride in (1, 2) and padding == 1
            and groups == features)


# ---------------------------------------------------------------------------
# Fused Pallas form: forward and backward as single-pass VPU kernels with NO
# conv ops anywhere — the "layout firewall". A depthwise conv is per-channel
# independent, so the grid splits channels (no halo); spatial taps are built
# in VMEM from W-rolls (pltpu.roll on the sublane dim — the sublane-offset
# *slices* of the earlier attempt are what Mosaic couldn't compile, ROOFLINE.md)
# and leading-dim H slices (untiled, free). The backward computes dx and the
# (9, C) weight grad in ONE pass over x/dy (dw accumulated across the batch
# grid in the fp32 output block, which stays VMEM-resident while its block
# index repeats).
# ---------------------------------------------------------------------------

def _wshift(a, s):
    """a[.., w+s, ..] with zeros shifted in at the edge (axis=1 of (H,W,C)).

    Mosaic's tpu.dynamic_rotate only handles 32-bit element types, so
    callers must pass fp32 (we roll small per-row-chunk fp32 slabs, never
    whole bf16 blocks)."""
    if s == 0:
        return a
    W = a.shape[1]
    r = pltpu.roll(a, (-s) % W, axis=1)
    col = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    keep = (col < W - 1) if s > 0 else (col > 0)
    return jnp.where(keep, r, jnp.zeros_like(r))


def _hrows(a, s, r0, r1):
    """Rows [r0+s, r1+s) of aA (zero rows outside [0, H)); static bounds."""
    H = a.shape[0]
    lo, hi = r0 + s, r1 + s
    parts = []
    if lo < 0:
        parts.append(jnp.zeros((-lo,) + a.shape[1:], a.dtype))
        lo = 0
    mid_hi = min(hi, H)
    if mid_hi > lo:
        parts.append(a[lo:mid_hi])
    if hi > H:
        parts.append(jnp.zeros((hi - H,) + a.shape[1:], a.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


_HCHUNK = 8  # rows per fp32 temp chunk (keeps Mosaic stack temps small)


def _fwd_kernel(x_ref, w_ref, y_ref):
    x = x_ref[0]                                       # (H, W, CB)
    H = x.shape[0]
    for r0 in range(0, H, _HCHUNK):
        r1 = min(r0 + _HCHUNK, H)
        acc = jnp.zeros((r1 - r0,) + x.shape[1:], jnp.float32)
        for kh in range(3):
            # H-slice the bf16 block (free, leading dim), THEN cast the
            # small chunk to fp32 and W-roll it — rolls must be 32-bit.
            rows = _hrows(x, kh - 1, r0, r1).astype(jnp.float32)
            for kw in range(3):
                tap = _wshift(rows, kw - 1)
                acc = acc + tap * w_ref[3 * kh + kw, :].astype(jnp.float32)
        y_ref[0, r0:r1] = acc.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, w_ref, dx_ref, dw_ref):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    x = x_ref[0]
    d = dy_ref[0]
    H, _, C = x.shape
    # per-tap running sums kept as separate values and concatenated at the
    # end — an in-place .at[tap].add would lower to scatter-add, which the
    # Mosaic TC pipeline does not implement
    taps = [jnp.zeros((1, C), jnp.float32) for _ in range(9)]
    for r0 in range(0, H, _HCHUNK):
        r1 = min(r0 + _HCHUNK, H)
        dch = d[r0:r1].astype(jnp.float32)
        dx_acc = jnp.zeros((r1 - r0,) + x.shape[1:], jnp.float32)
        for kh in range(3):
            xs_rows = _hrows(x, kh - 1, r0, r1).astype(jnp.float32)
            ds_rows = _hrows(d, 1 - kh, r0, r1).astype(jnp.float32)
            for kw in range(3):
                # dw[kh,kw] = sum dy * shift(x, kh-1, kw-1)
                xs = _wshift(xs_rows, kw - 1)
                t = jnp.sum(xs * dch, axis=(0, 1))[None, :]
                taps[3 * kh + kw] = taps[3 * kh + kw] + t
                # dx += w[kh,kw] * shift(dy, 1-kh, 1-kw)
                ds = _wshift(ds_rows, 1 - kw)
                dx_acc = dx_acc + ds * w_ref[3 * kh + kw, :].astype(jnp.float32)
        dx_ref[0, r0:r1] = dx_acc.astype(dx_ref.dtype)
    dw_acc = jnp.concatenate(taps + [jnp.zeros((7, C), jnp.float32)], axis=0)
    dw_ref[...] += dw_acc


def _cblock(H: int, W: int, C: int) -> int:
    """Largest 128-multiple channel block whose working set fits VMEM."""
    if C <= 128 or C % 128:
        return C
    cb = C
    while cb % 2 == 0 and cb // 2 % 128 == 0 and H * W * cb * 2 * 6 > 6_000_000:
        cb //= 2
    while cb % 3 == 0 and cb // 3 % 128 == 0 and H * W * cb * 2 * 6 > 6_000_000:
        cb //= 3
    return cb


def supports_fused(x_shape, interpret: bool = False) -> bool:
    B, H, W, C = x_shape
    if W < 2 or H < 1:
        return False
    cb = _cblock(H, W, C)
    # x/dy/dx blocks double-buffered (bf16) + fp32 temps must fit VMEM
    return H * W * cb * 2 * 6 + _HCHUNK * W * cb * 4 * 4 < 13_000_000


def _pallas_fwd(x, w9, interpret):
    B, H, W, C = x.shape
    cb = _cblock(H, W, C)
    nc = C // cb
    return pl.pallas_call(
        _fwd_kernel,
        grid=(nc, B),
        in_specs=[
            pl.BlockSpec((1, H, W, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((9, cb), lambda c, b: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, W, cb), lambda c, b: (b, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w9)


def _pallas_bwd(x, dy, w9, interpret):
    B, H, W, C = x.shape
    cb = _cblock(H, W, C)
    nc = C // cb
    dx, dw16 = pl.pallas_call(
        _bwd_kernel,
        grid=(nc, B),
        in_specs=[
            pl.BlockSpec((1, H, W, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((1, H, W, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((9, cb), lambda c, b: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((16, cb), lambda c, b: (0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dy.shape, dy.dtype),
            jax.ShapeDtypeStruct((16, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, dy, w9)
    return dx, dw16[:9]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3x3_fused(x: jnp.ndarray, w: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Depthwise 3x3 s1 p1 conv, fully Pallas fwd+bwd (no conv ops).

    Same contract as dw_conv3x3 / nn.Conv(feature_group_count=C): x NHWC,
    w HWIO (3, 3, 1, C). Falls back to the XLA forms off-TPU or when the
    shape doesn't fit the kernel's VMEM budget."""
    if not (interpret or _on_tpu()) or not supports_fused(x.shape, interpret):
        return _dw_fwd_raw(x, w)
    w9 = w.astype(x.dtype).reshape(9, x.shape[-1])
    return _pallas_fwd(x, w9, interpret)


def _fused_fwd(x, w, interpret):
    return dw_conv3x3_fused(x, w, interpret), (x, w)


def _fused_bwd(interpret, res, dy):
    x, w = res
    if not (interpret or _on_tpu()) or not supports_fused(x.shape, interpret):
        return _bwd(res, dy)
    w9 = w.astype(x.dtype).reshape(9, x.shape[-1])
    dx, dw9 = _pallas_bwd(x, dy, w9, interpret)
    return dx, dw9.reshape(3, 3, 1, x.shape[-1]).astype(w.dtype)


dw_conv3x3_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Mixed VJP ("wgrad" mode): forward and dx stay XLA convs (the op class that
# fuses with the surrounding BN/GELU and picks good layouts); ONLY the weight
# gradient — the batch-group conv whose InputBatchInSublanes emitter drags
# batch-minor layouts through the stem — is a Pallas one-pass kernel.
# MEASURED (v5e, round 4, full TinyViT-21M bs256 train-step A/B):
#   * fully-fused fwd+bwd ("True")  : 1,213 img/s — LOSES (the Pallas fwd
#     breaks XLA's conv+BN+GELU fusions);
#   * "wgrad" on stride-1 sites only: 1,293 img/s — LOSES (the one-pass
#     Pallas wgrad is an extra serial pass over x/dy that costs more than
#     the batch-group conv's layout poison ever did);
#   * XLA everywhere (False)        : 1,692 img/s — WINS.
# The layout-poison hypothesis did not survive the full-graph test: XLA's
# sibling fusions around the batch-group conv already amortize the copies.
# All kernels stay for experiments; the product default is False.
# ---------------------------------------------------------------------------

def _wgrad_kernel(x_ref, dy_ref, dw_ref):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    x = x_ref[0]
    d = dy_ref[0]
    H, _, C = x.shape
    taps = [jnp.zeros((1, C), jnp.float32) for _ in range(9)]
    for r0 in range(0, H, _HCHUNK):
        r1 = min(r0 + _HCHUNK, H)
        dch = d[r0:r1].astype(jnp.float32)
        for kh in range(3):
            xs_rows = _hrows(x, kh - 1, r0, r1).astype(jnp.float32)
            for kw in range(3):
                xs = _wshift(xs_rows, kw - 1)
                taps[3 * kh + kw] = taps[3 * kh + kw] + jnp.sum(
                    xs * dch, axis=(0, 1))[None, :]
    dw_ref[...] += jnp.concatenate(taps + [jnp.zeros((7, C), jnp.float32)],
                                   axis=0)


def _pallas_wgrad(x, dy, interpret=False):
    B, H, W, C = x.shape
    cb = _cblock(H, W, C)
    dw16 = pl.pallas_call(
        _wgrad_kernel,
        grid=(C // cb, B),
        in_specs=[
            pl.BlockSpec((1, H, W, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((1, H, W, cb), lambda c, b: (b, 0, 0, c)),
        ],
        out_specs=pl.BlockSpec((16, cb), lambda c, b: (0, c)),
        out_shape=jax.ShapeDtypeStruct((16, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, dy)
    return dw16[:9]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3x3_wg(x: jnp.ndarray, w: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Depthwise 3x3 s1 p1 conv: XLA fwd + XLA dx, Pallas wgrad only."""
    return _dw_fwd_raw(x, w)


def _wg_fwd(x, w, interpret):
    return _dw_fwd_raw(x, w), (x, w)


def _wg_bwd(interpret, res, dy):
    x, w = res
    dx = _dx_xla(dy, w)
    if (interpret or _on_tpu()) and supports_fused(x.shape, interpret):
        dw9 = _pallas_wgrad(x, dy, interpret)
        dw = dw9.reshape(3, 3, 1, x.shape[-1]).astype(w.dtype)
    else:
        dw = _dw_9shift(x, dy).astype(w.dtype)
    return dx, dw


dw_conv3x3_wg.defvjp(_wg_fwd, _wg_bwd)


# A stride-2 Pallas-wgrad custom_vjp (dw_conv3x3s2_wg) used to live here; it
# passed every isolated-shape parity test but FAULTED the TPU worker when
# compiled into the full TinyViT train step (round 4, reproduced twice).
# Because a full-graph-only fault could not be minimized (every isolated
# shape, including the exact PatchMerging shapes, passes) and the stride-1
# wgrad already loses the full-step A/B, the kernel was EXCISED in round 5.
# Full record: ISSUES.md #1; bisect evidence: tools/dw_crash_bisect{,2}.py.


def dw_conv3x3_auto(x: jnp.ndarray, w: jnp.ndarray,
                    mode=None) -> jnp.ndarray:
    """Product routing for ConvBN.dw_vjp: the mode selects the variant —
    False = plain XLA conv; "wgrad" = XLA fwd/dx + Pallas wgrad (the measured
    winner's candidate); True = fully-fused Pallas fwd+bwd (measured LOSER in
    the full train step — kept for experiments). None defers to
    DEFAULT_DW_VJP."""
    if mode is None:
        mode = DEFAULT_DW_VJP
    if _on_tpu() and supports_fused(x.shape):
        if mode == "wgrad":
            return dw_conv3x3_wg(x, w)
        if mode:
            return dw_conv3x3_fused(x, w)
    return _dw_fwd_raw(x, w)


# ---------------------------------------------------------------------------
# Stride-2 via parity-phase splitting (PatchMerging / EfficientViT subsample
# / Cream downsample dw convs). Stride-2 access is NOT expressible inside a
# Mosaic kernel (leading-dim a[0::2] lowers to an unsupported gather;
# sublane-strided slices are the original compile explosion — ROOFLINE.md),
# so XLA pre-splits x into its 4 spatial parity phases (cheap elementwise
# slices); every stride-2 tap then becomes a {0,-1}-shifted STRIDE-1 read of
# one phase, and the kernel reuses the roll/row-slice machinery above. The
# backward emits dx as 4 phase tensors that XLA re-interleaves with
# stack+reshape (leading/minor-adjacent dims only).
#
# Tap map for out index (ho, wo) reading source (2*ho+kh-1, 2*wo+kw-1):
#   kh=0 -> H-odd phase, row ho-1 ; kh=1 -> H-even, ho ; kh=2 -> H-odd, ho
# (same for kw/W). Even H and W only (all reference call sites are even).
# ---------------------------------------------------------------------------

def _dw2_fwd_raw(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS,
        feature_group_count=x.shape[-1])


def _phase_split(x):
    return (x[:, 0::2, 0::2], x[:, 0::2, 1::2],
            x[:, 1::2, 0::2], x[:, 1::2, 1::2])


def _tap_rows(phases, kh, r0, r1):
    """Per-chunk fp32 W-tap variants for tap row kh: {kw: (rows, Wo, C)}.

    H-slices the right bf16 parity phase first (free, leading dim), casts
    the chunk to fp32, then W-rolls — Mosaic rolls must be 32-bit.
    kw=0 -> odd W phase shifted -1, kw=1 -> even, kw=2 -> odd unshifted."""
    xee, xeo, xoe, xoo = phases
    even, odd = (xee, xeo) if kh == 1 else (xoe, xoo)
    s_h = -1 if kh == 0 else 0
    even_rows = _hrows(even, s_h, r0, r1).astype(jnp.float32)
    odd_rows = _hrows(odd, s_h, r0, r1).astype(jnp.float32)
    return {0: _wshift(odd_rows, -1), 1: even_rows, 2: odd_rows}


def _fwd2_kernel(xee_ref, xeo_ref, xoe_ref, xoo_ref, w_ref, y_ref):
    phases = (xee_ref[0], xeo_ref[0], xoe_ref[0], xoo_ref[0])
    Ho = y_ref.shape[1]
    for r0 in range(0, Ho, _HCHUNK):
        r1 = min(r0 + _HCHUNK, Ho)
        acc = jnp.zeros((r1 - r0,) + y_ref.shape[2:], jnp.float32)
        for kh in range(3):
            wvar = _tap_rows(phases, kh, r0, r1)
            for kw in range(3):
                acc = acc + wvar[kw] * w_ref[3 * kh + kw, :].astype(jnp.float32)
        y_ref[0, r0:r1] = acc.astype(y_ref.dtype)


def _bwd2_kernel(xee_ref, xeo_ref, xoe_ref, xoo_ref, dy_ref, w_ref,
                 dxee_ref, dxeo_ref, dxoe_ref, dxoo_ref, dw_ref):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    phases = (xee_ref[0], xeo_ref[0], xoe_ref[0], xoo_ref[0])
    d = dy_ref[0]
    Ho, _, C = d.shape
    w9 = [w_ref[i, :].astype(jnp.float32) for i in range(9)]
    tap_tot = [jnp.zeros((1, C), jnp.float32) for _ in range(9)]
    for r0 in range(0, Ho, _HCHUNK):
        r1 = min(r0 + _HCHUNK, Ho)
        dch = d[r0:r1].astype(jnp.float32)
        dch_w = _wshift(dch, 1)                            # dy[a, b+1]
        dch_h = _hrows(d, 1, r0, r1).astype(jnp.float32)   # dy[a+1, b]
        dch_hw = _wshift(dch_h, 1)                         # dy[a+1, b+1]
        for kh in range(3):
            wvar = _tap_rows(phases, kh, r0, r1)
            for kw in range(3):
                tap_tot[3 * kh + kw] = tap_tot[3 * kh + kw] + jnp.sum(
                    wvar[kw] * dch, axis=(0, 1))[None, :]
        # dx parity phases (derivation: dx[h, w] sums taps with
        # kh ≡ (h+1) mod 2, kw ≡ (w+1) mod 2; ho = (h-kh+1)/2 etc.)
        dxee_ref[0, r0:r1] = (w9[4] * dch).astype(dxee_ref.dtype)
        dxeo_ref[0, r0:r1] = (w9[3] * dch_w +
                              w9[5] * dch).astype(dxeo_ref.dtype)
        dxoe_ref[0, r0:r1] = (w9[1] * dch_h +
                              w9[7] * dch).astype(dxoe_ref.dtype)
        dxoo_ref[0, r0:r1] = (w9[0] * dch_hw + w9[2] * dch_h +
                              w9[6] * dch_w +
                              w9[8] * dch).astype(dxoo_ref.dtype)
    dw_ref[...] += jnp.concatenate(
        tap_tot + [jnp.zeros((7, C), jnp.float32)], axis=0)


def supports_fused_s2(x_shape) -> bool:
    B, H, W, C = x_shape
    if H % 2 or W % 2 or W < 4:
        return False
    return supports_fused((B, H // 2, W // 2, C))


def _phase_specs(B, Ho, Wo, cb, n):
    return [pl.BlockSpec((1, Ho, Wo, cb), lambda c, b: (b, 0, 0, c))
            for _ in range(n)]


def _pallas_fwd2(x, w9, interpret):
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    cb = _cblock(Ho, Wo, C)
    phases = _phase_split(x)
    return pl.pallas_call(
        _fwd2_kernel,
        grid=(C // cb, B),
        in_specs=_phase_specs(B, Ho, Wo, cb, 4) + [
            pl.BlockSpec((9, cb), lambda c, b: (0, c))],
        out_specs=pl.BlockSpec((1, Ho, Wo, cb), lambda c, b: (b, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*phases, w9)


def _pallas_bwd2(x, dy, w9, interpret):
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    cb = _cblock(Ho, Wo, C)
    phases = _phase_split(x)
    ph_shape = jax.ShapeDtypeStruct((B, Ho, Wo, C), dy.dtype)
    *dxp, dw16 = pl.pallas_call(
        _bwd2_kernel,
        grid=(C // cb, B),
        in_specs=_phase_specs(B, Ho, Wo, cb, 5) + [
            pl.BlockSpec((9, cb), lambda c, b: (0, c))],
        out_specs=_phase_specs(B, Ho, Wo, cb, 4) + [
            pl.BlockSpec((16, cb), lambda c, b: (0, c))],
        out_shape=[ph_shape] * 4 + [
            jax.ShapeDtypeStruct((16, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*phases, dy, w9)
    # re-interleave the parity phases: W first (minor-adjacent stack),
    # then H (leading) — reshapes only touch adjacent dims
    row_e = jnp.stack([dxp[0], dxp[1]], axis=3).reshape(B, Ho, W, C)
    row_o = jnp.stack([dxp[2], dxp[3]], axis=3).reshape(B, Ho, W, C)
    dx = jnp.stack([row_e, row_o], axis=2).reshape(B, H, W, C)
    return dx, dw16[:9]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv3x3s2_fused(x: jnp.ndarray, w: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Depthwise 3x3 STRIDE-2 pad-1 conv, Pallas fwd+bwd via parity phases.

    Contract matches nn.Conv(k=3, strides=2, padding=1,
    feature_group_count=C); falls back to the XLA conv off-TPU or for
    odd spatial sizes."""
    if not (interpret or _on_tpu()) or not supports_fused_s2(x.shape):
        return _dw2_fwd_raw(x, w)
    w9 = w.astype(x.dtype).reshape(9, x.shape[-1])
    return _pallas_fwd2(x, w9, interpret)


def _fused2_fwd(x, w, interpret):
    return dw_conv3x3s2_fused(x, w, interpret), (x, w)


def _fused2_bwd(interpret, res, dy):
    x, w = res
    if not (interpret or _on_tpu()) or not supports_fused_s2(x.shape):
        # XLA autodiff of the conv form
        _, vjp = jax.vjp(lambda x_, w_: _dw2_fwd_raw(x_, w_), x, w)
        return vjp(dy)
    w9 = w.astype(x.dtype).reshape(9, x.shape[-1])
    dx, dw9 = _pallas_bwd2(x, dy, w9, interpret)
    return dx, dw9.reshape(3, 3, 1, x.shape[-1]).astype(w.dtype)


dw_conv3x3s2_fused.defvjp(_fused2_fwd, _fused2_bwd)


def dw_conv3x3s2_auto(x: jnp.ndarray, w: jnp.ndarray,
                      mode=None) -> jnp.ndarray:
    if mode is None:
        mode = DEFAULT_DW_VJP
    if _on_tpu() and supports_fused_s2(x.shape):
        # No "wgrad" variant here: the stride-2 Pallas-wgrad kernel faulted
        # the TPU worker inside the full train graph (isolated shapes all
        # pass) and was excised in round 5 — see ISSUES.md #1.
        if mode is True:
            return dw_conv3x3s2_fused(x, w)
    return _dw2_fwd_raw(x, w)
