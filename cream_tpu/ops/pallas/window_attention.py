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
for the output projection.

Inner structure (why it looks the way it does — each choice measured on v5e):
  - Keys/values are zero-padded to KP (lane-multiple) rows and the bias is
    pre-padded with -1e9 on the padded key columns, so the Q@K^T and P@V dots
    need no output slicing and padded keys contribute exactly zero.
  - All heads' (N, KP) score tiles for a window are written into one fp32
    VMEM scratch at sublane-aligned offsets and softmaxed in ONE stacked
    pass: 24 tiny per-head softmax chains per program were the dominant cost
    (3.8 of 5.8 ms at TinyViT stage-1 shapes — VPU dispatch-bound, not
    throughput-bound); stacking halves the whole kernel (5.8 -> 2.9 ms).

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

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Round-4 softmax rewrite (measured, tools/wa_micro.py ablations on v5e):
# the stacked softmax was ~2.0 ms of the 4.1 ms isolated S3-stage-0 kernel —
# NOT dispatch-bound (window-stacking only got to 2.53) but reduce-bound: the
# per-row max and sum are ~7-stage cross-lane reductions on the VPU. The
# round-4 form dropped the max-subtract entirely (clamp at 60 guards exp
# overflow) and routed the row sum through the MXU as a dot-with-ones:
# 4.17 -> 2.26 ms at S3 stage-0. A block-diagonal-Q single-issue-dot variant
# measured SLOWER (2.99).
#
# Round-5 RESOLUTION (measured, tools/smax_ab.py full-model A/B on v5e,
# post-qkv-bias-fold): the max-free hazard buys nothing at model level, so
# the EXACT per-row form ships. img/s, higher better:
#   mode          S3-T eval bs128   TinyViT eval bs256   TinyViT train bs256
#   False (exact)      4777              6997                 1708
#   "maxfree"          4856 (+1.6%)      6976 (-0.3%)         1688 (-1.2%)
#   "safe"             4022 (-16%)       6443 (-8%)           1623 (-5%)
# The round-4 isolated-kernel win (4.17 -> 2.26 ms at S3 stage-0) did not
# survive the qkv-bias fold at model level — "maxfree" nets +1.6% on ONE
# model and LOSES on the train path (it explains round 4's 1,701 -> 1,691
# train regression). Its hazard is real: any row whose max logit exceeds
# the 60 clamp silently flattens, and an all-below--87 row NaNs (fp32 exp
# underflow; TPU flushes subnormals) — trained models can grow attention
# logits far past random-init scales. "safe" (one running scalar shift per
# stacked tile, floored at -80) fixes the numerics but the per-head
# tile->scalar max reduces serialize the score loop: -8..-16%.
# Tri-state A/B flag: False (SHIPPED: exact per-row max + VPU sum) |
# "maxfree" (round-4 form, |logit|<60 assumption) | "safe" (scalar-shift
# MXU row-sum). tests/test_pallas_kernels.py::TestSoftmaxRangeGuard pins
# exactness of the shipped default and of "safe" at +/-90..120 logit
# scales, and that "maxfree" really does break there.
MXU_SOFTMAX: str | bool = False

# Round-5 forward restructure (the M0 CGA-softmax lesson applied in-kernel):
# of the exact softmax's four VPU passes over the stacked (heads*NP, KP)
# tile — max-reduce, exp, sum-reduce, divide — only max+exp are kept on the
# VPU. The row sum becomes ONE stacked MXU dot-with-ones (the MXU is ~idle
# here anyway) and the divide is deferred to the per-head (N, dv) output
# tiles with a sublane-aligned (N, 1) broadcast: 49x32 multiplies instead
# of 168x128 at S3 stage-0. Numerics: the exact per-row max-subtract is
# RETAINED (no "maxfree" range hazard); exp(s-max) <= 1 so the bf16 P
# storage and the fp32-accumulated MXU rowsum are as precise as the old
# divide-then-dot form. Forward-only — the bwd recomputes normalized P
# with the classic form, which is mathematically identical.
#
# Measured (tools/pvfold_ab.py, full models on v5e, best-of-3):
#   - first form (per-head ones-COLUMN in the PV dot + lane-slice divide):
#     LOSES — S3-T 4682 vs 4777, TinyViT 6543 vs 7004. The lane-dim concat
#     and the unaligned o[:, dv:dv+1] slice cost more than the VPU sum.
#   - this form (one stacked dot-with-ones + aligned deferred divide):
#     S3-T 4838 vs 4779 (+1.2%), TinyViT 6936 vs 7005 (-1.0%).
# Verdict is layout/shape-split, so: None = AUTO (on for qkv_major — the
# Swin/S3 family where it wins — off for head_major); True/False force it
# everywhere (A/B use).
PV_FOLD_NORM: bool | None = None

# Round-5 backward counterpart: the bwd kernel's two VPU lane-reduces per
# stacked tile — the softmax-recompute row sum and the dS rowsum(dP*P) —
# move to MXU dot-with-ones (exact per-row max and the divides stay on the
# VPU; only the SUMS move). Unlike the fwd, the divide cannot be deferred:
# normalized P is consumed by dV = P^T dO and dS.
#
# VERDICT (measured, tools/bwdsum_ab.py full train steps on v5e): LOSES on
# both families — S3-T 1305.5 vs 1337.2 img/s (-2.4%), TinyViT 1667.7 vs
# 1707.4 (-2.3%). Unlike the fwd's bf16 P (full-rate MXU), the bwd tiles
# are fp32: the fp32 dot-with-ones runs at ~1/8 MXU rate, and dP*P — which
# the VPU reduce consumed fused — must materialize as an fp32 operand tile
# for the dot. Gated off; kept as the recorded experiment.
BWD_MXU_SUM: bool = False

# Round-5 window PACKING: at window-7 stages the (N, KP) score tiles are
# 49 real keys in 128 lanes — 62% lane padding — and the per-window loop
# issues 2*heads tiny dots + ws slice-writes per 49-token window; wa_micro
# shows the kernel is reduce- and issue-bound, not FLOP-bound. Packing
# G=2 adjacent windows per iteration fills 98 of 128 lanes, halves the
# dot/softmax-pass/write issue count, and trims the per-head pad rows
# (NP 2x56 -> 104). Cross-window attention terms are killed by -1e9 in a
# host-precomputed PAIRED bias table (same mechanism as the key padding),
# so the math is exactly the per-window softmax. Applies when nW is even
# and 2N fits the same padded lane count (N<=64); stage-3 7x7 grids and
# window-14 stages fall back to G=1. None = auto (pack when it fits),
# 1 / 2 force. Measured on v5e: see ROOFLINE.md S3 section.
WIN_PACK: int | None = None


def _rowsum_mxu(t, KP: int):
    ones = jnp.ones((KP, 128), t.dtype)
    tot = jax.lax.dot_general(t, ones, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return tot[:, :1]


def _softmax_rows(s, out_dtype, KP: int, shift=None):
    """Row softmax of a (rows, KP) fp32 tile, MXU-summed.

    shift: scalar to subtract from scores before exp ("safe" mode; must be
    >= every real score so exp cannot overflow; the -80 floor then bounds
    underflow to a per-row uniformization, never a 0-sum NaN)."""
    if MXU_SOFTMAX:
        if shift is not None:
            p = jnp.exp(jnp.maximum(s - shift, -80.0))
        else:
            p = jnp.exp(jnp.minimum(s, 60.0))
        ones = jnp.ones((KP, 128), jnp.float32)
        tot = jax.lax.dot_general(p, ones, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (p * (1.0 / tot[:, :1])).astype(out_dtype)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_dtype)


def _safe_shift():
    return MXU_SOFTMAX == "safe"


def _rowsum(t, KP: int):
    """Row sum of a (rows, KP) fp32 tile as (rows, 1); MXU dot-with-ones
    under MXU_SOFTMAX (same reduce-vs-MXU economics as _softmax_rows)."""
    if MXU_SOFTMAX or BWD_MXU_SUM:
        ones = jnp.ones((KP, 128), jnp.float32)
        tot = jax.lax.dot_general(t, ones, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return tot[:, :1]
    return jnp.sum(t, axis=-1, keepdims=True)


def _offsets(layout: str, heads: int, kd: int, dv: int):
    if layout == "head_major":
        return [(h * (2 * kd + dv), h * (2 * kd + dv) + kd,
                 h * (2 * kd + dv) + 2 * kd) for h in range(heads)]
    if layout == "qkv_major":
        return [(h * kd, heads * kd + h * kd, 2 * heads * kd + h * dv)
                for h in range(heads)]
    raise ValueError(f"unknown qkv layout: {layout}")


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


def _kernel(qkv_ref, bias_ref, *rest, ws: int, ww: int, n_win: int,
            heads: int, kd: int, dv: int, scale: float, has_mask: bool,
            has_qb: bool, offs, N: int, NP: int, KP: int,
            pv_fold: bool = False):
    rest = list(rest)
    mask_ref = rest.pop(0) if has_mask else None
    qb_ref = rest.pop(0) if has_qb else None
    out_ref, sc_ref = rest
    L = qkv_ref.shape[-1]
    for j in range(n_win):
        # (ws, ws, L) -> (N, L): Mosaic can't shape-cast a sublane-dim merge,
        # so stack the window's rows along sublanes explicitly; then append
        # KP-N zero rows so k/v slices are already key-padded.
        rows = [qkv_ref[0, r, j * ww:(j + 1) * ww, :] for r in range(ws)]
        if KP > N:
            rows.append(jnp.zeros((KP - N, L), qkv_ref.dtype))
        xp = jnp.concatenate(rows, axis=0)                # (KP, L)
        if has_qb:
            # qkv projection bias folded in-kernel: the HBM-side add was a
            # whole extra pass over the qkv tensor (XLA's layout copy before
            # this custom-call breaks the GEMM+bias fusion — measured 0.91 ms
            # per stage-1 block at TinyViT bs256). Padded key/value rows get
            # the bias too, which is safe: their softmax weight is exactly 0
            # (-1e9 bias pad underflows exp to 0.0 in fp32).
            xp = xp + qb_ref[0:1, :].astype(xp.dtype)
        # "safe" softmax shift: running scalar max over the scores actually
        # written (stale NP-pad scratch rows never enter it).
        m = jnp.float32(-3.0e38)
        for h in range(heads):
            qo, ko, vo = offs[h]
            q = xp[:N, qo:qo + kd]
            k = xp[:, ko:ko + kd]                          # (KP, kd)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h]                    # (N, KP)
            if has_mask:
                s = s + mask_ref[j]
            sc_ref[h * NP:h * NP + N, :] = s
            if _safe_shift():
                m = jnp.maximum(m, jnp.max(s))
        # one stacked softmax over all heads' scores of this window
        if pv_fold and not MXU_SOFTMAX:
            s = sc_ref[:, :]
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            p = p.astype(qkv_ref.dtype)                    # exp<=1: bf16-safe
            # rowsum of the WHOLE stacked tile as one MXU dot-with-ones
            # (v1-concat / per-head ones-column form measured SLOWER: the
            # lane-dim concat + unaligned lane-slice divide cost more than
            # the VPU sum they replaced — S3 -2%, TinyViT -6.6%).
            ones = jnp.ones((KP, 128), p.dtype)
            tot = jax.lax.dot_general(p, ones, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            inv = 1.0 / tot[:, :1]                         # (heads*NP, 1)
            outs = []
            for h in range(heads):
                vo = offs[h][2]
                v = xp[:, vo:vo + dv]                      # (KP, dv)
                o = jax.lax.dot_general(p[h * NP:h * NP + N, :], v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                outs.append((o * inv[h * NP:h * NP + N, :])
                            .astype(out_ref.dtype))
        else:
            p = _softmax_rows(sc_ref[:, :], qkv_ref.dtype, KP,
                              shift=m if _safe_shift() else None)
            outs = []
            for h in range(heads):
                vo = offs[h][2]
                v = xp[:, vo:vo + dv]                      # (KP, dv)
                o = jax.lax.dot_general(p[h * NP:h * NP + N, :], v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                outs.append(o.astype(out_ref.dtype))
        o = jnp.concatenate(outs, axis=-1)                 # (N, heads*dv)
        for r in range(ws):
            out_ref[0, r, j * ww:(j + 1) * ww, :] = o[r * ww:(r + 1) * ww, :]


def _bwd_kernel(qkv_ref, bias_ref, *rest, ws: int, ww: int, n_win: int,
                heads: int, kd: int, dv: int, scale: float, has_mask: bool,
                has_qb: bool, offs, N: int, NP: int, KP: int, layout: str,
                hc: int, stacked: bool):
    """Backward of `_kernel`: recompute-P flash-style (windows are tiny, so
    a full recompute is one extra (N, KP) matmul per head), then the standard
    softmax-attention vjp. All heads' P tiles live stacked in a fp32 VMEM
    scratch so the softmax recompute (the VPU-dispatch-bound part, same
    economics as the fwd's stacked softmax) runs in a few wide passes.
    dbias is accumulated across the whole sequential grid into a single
    revisited (heads*NP, KP) output block.

    Two shapes of the softmax-bwd elementwise, both measured on v5e:
      - stacked=True: dP tiles stack in a second scratch and
        dS = P*(dP - rowsum(dP*P)) runs as one wide pass. This is the fast
        form at small-window shapes — per-head chains at TinyViT stage 1
        (24 head-windows of (56,128) per program) are VPU-dispatch-bound and
        cost 9.5 ms/block vs 2.2 for the fwd.
      - stacked=False: dS per head with an immediate (N,1) rowsum. Used when
        (heads*NP, KP) fp32 is too big for a second scratch: at stage-2
        shapes (12 heads, N=196) the extra 2.4 MB scratch plus Mosaic stack
        temporaries blow the 16 MB scoped-vmem limit; the per-head ops there
        are (200,256)-sized, so dispatch overhead is amortized anyway.
    The stacked passes run in `hc`-head chunks to bound stack temporaries."""
    rest = list(rest)
    mask_ref = rest.pop(0) if has_mask else None
    qb_ref = rest.pop(0) if has_qb else None
    dout_ref, dqkv_ref, dbias_ref, p_sc, d_sc = rest
    L = qkv_ref.shape[-1]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for j in range(n_win):
        rows = [qkv_ref[0, r, j * ww:(j + 1) * ww, :] for r in range(ws)]
        if KP > N:
            rows.append(jnp.zeros((KP - N, L), qkv_ref.dtype))
        xp = jnp.concatenate(rows, axis=0)                 # (KP, L)
        if has_qb:
            xp = xp + qb_ref[0:1, :].astype(xp.dtype)      # same fold as fwd
        do = jnp.concatenate([dout_ref[0, r, j * ww:(j + 1) * ww, :]
                              for r in range(ws)], axis=0)  # (N, heads*dv)
        # recompute scores, stacked softmax (same trick + same shift as fwd,
        # so the recomputed P is bit-identical to the forward's)
        m = jnp.float32(-3.0e38)
        for h in range(heads):
            qo, ko, _ = offs[h]
            q = xp[:N, qo:qo + kd]
            k = xp[:, ko:ko + kd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h]
            if has_mask:
                s = s + mask_ref[j]
            p_sc[h * NP:h * NP + N, :] = s
            if _safe_shift():
                m = jnp.maximum(m, jnp.max(s))
        for c in range(0, heads, hc):
            r0, r1 = c * NP, min(c + hc, heads) * NP
            if BWD_MXU_SUM and not MXU_SOFTMAX:
                s = p_sc[r0:r1, :]
                pu = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
                p_sc[r0:r1, :] = pu * (1.0 / _rowsum_mxu(pu, KP))
            else:
                p_sc[r0:r1, :] = _softmax_rows(
                    p_sc[r0:r1, :], jnp.float32, KP,
                    shift=m if _safe_shift() else None)
        # vjp: dP = dO V^T; dS = P*(dP - rowsum(dP*P)); dQ = dS K;
        # dK = dS^T Q; dV = P^T dO.
        if stacked:
            for h in range(heads):
                vo = offs[h][2]
                v = xp[:, vo:vo + dv]                      # (KP, dv)
                do_h = do[:, h * dv:(h + 1) * dv]          # (N, dv)
                dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                d_sc[h * NP:h * NP + N, :] = dp
            for c in range(0, heads, hc):
                r0, r1 = c * NP, min(c + hc, heads) * NP
                p = p_sc[r0:r1, :]
                dp = d_sc[r0:r1, :]
                ds = p * (dp - _rowsum(dp * p, KP))
                d_sc[r0:r1, :] = ds
                dbias_ref[r0:r1, :] += ds
        dqs, dks, dvs = [], [], []
        for h in range(heads):
            qo, ko, vo = offs[h]
            q = xp[:N, qo:qo + kd]
            k = xp[:, ko:ko + kd]
            v = xp[:, vo:vo + dv]                          # (KP, dv)
            do_h = do[:, h * dv:(h + 1) * dv]              # (N, dv)
            p_h = p_sc[h * NP:h * NP + N, :]               # (N, KP)
            if stacked:
                ds = d_sc[h * NP:h * NP + N, :]
            else:
                dp = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                ds = p_h * (dp - _rowsum(dp * p_h, KP))
                dbias_ref[h * NP:h * NP + N, :] += ds
            dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dvh = jax.lax.dot_general(p_h, do_h, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dqs.append(dq * scale)                         # (N, kd)
            dks.append(dk[:N] * scale)                     # (N, kd)
            dvs.append(dvh[:N])                            # (N, dv)
        if layout == "head_major":
            cols = []
            for h in range(heads):
                cols += [dqs[h], dks[h], dvs[h]]
        else:
            cols = dqs + dks + dvs
        dxp = jnp.concatenate(cols, axis=-1).astype(dqkv_ref.dtype)  # (N, L)
        for r in range(ws):
            dqkv_ref[0, r, j * ww:(j + 1) * ww, :] = \
                dxp[r * ww:(r + 1) * ww, :]


def _specs(B, H, W, L, window, heads, N, KP, nW, has_mask, has_qb):
    in_specs = [
        pl.BlockSpec((1, window, W, L), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, N, KP), lambda b, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_mask:
        in_specs.append(pl.BlockSpec((nW, N, KP), lambda b, i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    if has_qb:
        in_specs.append(pl.BlockSpec((1, L), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return in_specs


def _pallas_fwd(statics, qkv, bias_p, mask_p, qb_p):
    window, heads, kd, dv, layout, interpret, pv_fold, G = statics
    B, H, W, L = qkv.shape
    N = G * window * window          # tokens per iteration (G windows)
    nH, nW = H // window, W // window
    n_it = nW // G
    NP, KP = _round_up(N, 8), _round_up(N, 128)
    args = [qkv, bias_p] + ([] if mask_p is None else [mask_p]) \
        + ([] if qb_p is None else [qb_p])
    return pl.pallas_call(
        functools.partial(_kernel, ws=window, ww=G * window, n_win=n_it,
                          heads=heads, kd=kd,
                          dv=dv, scale=kd ** -0.5, has_mask=mask_p is not None,
                          has_qb=qb_p is not None,
                          offs=tuple(_offsets(layout, heads, kd, dv)),
                          N=N, NP=NP, KP=KP, pv_fold=pv_fold),
        out_shape=jax.ShapeDtypeStruct((B, H, W, heads * dv), qkv.dtype),
        grid=(B, nH),
        in_specs=_specs(B, H, W, L, window, heads, N, KP, n_it,
                        mask_p is not None, qb_p is not None),
        out_specs=pl.BlockSpec((1, window, W, heads * dv),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((heads * NP, KP), jnp.float32)],
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fwa(statics, qkv, bias_p, mask_p, qb_p):
    return _pallas_fwd(statics, qkv, bias_p, mask_p, qb_p)


def _fwa_fwd(statics, qkv, bias_p, mask_p, qb_p):
    return _pallas_fwd(statics, qkv, bias_p, mask_p, qb_p), \
        (qkv, bias_p, mask_p, qb_p)


def _fwa_bwd(statics, res, dout):
    qkv, bias_p, mask_p, qb_p = res
    window, heads, kd, dv, layout, interpret, _pv_fold, G = statics
    B, H, W, L = qkv.shape
    N = G * window * window          # tokens per iteration (G windows)
    nH, nW = H // window, W // window
    n_it = nW // G
    NP, KP = _round_up(N, 8), _round_up(N, 128)
    has_mask = mask_p is not None
    has_qb = qb_p is not None
    in_specs = _specs(B, H, W, L, window, heads, N, KP, n_it, has_mask,
                      has_qb)
    in_specs.append(pl.BlockSpec((1, window, W, heads * dv),
                                 lambda b, i: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM))
    args = [qkv, bias_p] + ([mask_p] if has_mask else []) \
        + ([qb_p] if has_qb else []) + [dout]
    # head-chunk the stacked softmax recompute so each pass's fp32 stack
    # temporaries (~3 live at once) stay under ~2 MB (see _bwd_kernel)
    hc = max(1, int(6e5) // (NP * KP * 4))
    # stacked-dP form only where the extra scratch fits the scoped-vmem
    # budget (see _bwd_kernel docstring for the measured tradeoff)
    stacked = heads * NP * KP * 4 <= 2_500_000
    dqkv, dbias_st = pl.pallas_call(
        functools.partial(_bwd_kernel, ws=window, ww=G * window,
                          n_win=n_it, heads=heads,
                          kd=kd, dv=dv, scale=kd ** -0.5, has_mask=has_mask,
                          has_qb=has_qb,
                          offs=tuple(_offsets(layout, heads, kd, dv)),
                          N=N, NP=NP, KP=KP, layout=layout, hc=hc,
                          stacked=stacked),
        out_shape=[jax.ShapeDtypeStruct((B, H, W, L), qkv.dtype),
                   jax.ShapeDtypeStruct((heads * NP, KP), jnp.float32)],
        grid=(B, nH),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, window, W, L), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((heads * NP, KP), lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((heads * NP, KP), jnp.float32),
                        pltpu.VMEM((heads * NP, KP) if stacked else (8, 128),
                                   jnp.float32)],
        # stage-2 shapes (heads=12, N=196) sit at ~16.7MB of blocks +
        # scratches + Mosaic stack temps — right at the compiler's 16MB
        # default scoped-vmem limit (observed to tip over across otherwise
        # identical compiles). v5e has 128MB of VMEM; give the bwd headroom.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    dbias_p = dbias_st.reshape(heads, NP, KP)[:, :N, :]
    dmask = None if mask_p is None else jnp.zeros_like(mask_p)
    # d(qkv bias) = sum of dqkv over all tokens — the same reduce XLA's
    # autodiff of the Dense bias-add performed before the fold (fp32 accum).
    dqb = None if qb_p is None else \
        dqkv.astype(jnp.float32).sum(axis=(0, 1, 2))[None, :].astype(qb_p.dtype)
    return dqkv, dbias_p, dmask, dqb


_fwa.defvjp(_fwa_fwd, _fwa_bwd)


@functools.partial(jax.jit, static_argnames=("window", "heads", "kd", "dv",
                                             "layout", "interpret"))
def fused_window_attention(qkv: jnp.ndarray, bias: jnp.ndarray,
                           mask: jnp.ndarray | None = None, *,
                           window: int, heads: int, kd: int, dv: int,
                           layout: str = "head_major",
                           qkv_bias: jnp.ndarray | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    """Windowed multi-head bias-attention without any HBM transpose.

    qkv:  (B, H, W, heads*(2*kd+dv)) — fused qkv projection output, lanes
          packed per `layout`. H and W must be multiples of `window`
          (callers pad; padded windows are self-contained garbage that the
          caller crops, matching reference zero-pad semantics).
    bias: (heads, N, N) fp32 per-offset attention bias, N = window**2.
    mask: optional (nH*nW, N, N) fp32 additive mask per window position
          (Swin shifted windows).
    qkv_bias: optional (L,) qkv PROJECTION bias, added to the qkv tensor
          in-kernel (callers then run the qkv Dense without its bias add —
          saves a full HBM pass over the qkv tensor that XLA cannot fuse
          across the layout copy it inserts before this custom-call).
    Returns (B, H, W, heads*dv).

    Differentiable: a custom_vjp routes the backward through a recompute-P
    Pallas kernel (same BlockSpec windowing, no HBM transposes), so the
    training graph keeps the fused path instead of falling back to the
    layout-poisoned einsum form. d(bias) is accumulated in-kernel across the
    sequential grid; the shift mask is a host constant and gets zero grad.
    """
    B, H, W, L = qkv.shape
    assert H % window == 0 and W % window == 0, (H, W, window)
    assert L == heads * (2 * kd + dv), (L, heads, kd, dv)
    N = window * window
    assert bias.shape == (heads, N, N), (bias.shape, heads, N)
    nH, nW = H // window, W // window
    can2 = nW % 2 == 0 and _round_up(2 * N, 128) == _round_up(N, 128)
    if WIN_PACK is None:
        G = 2 if can2 else 1
    else:
        G = 2 if (WIN_PACK == 2 and can2) else 1
    NN = G * N                       # tokens per kernel iteration
    KP = _round_up(NN, 128)     # key rows padded to a lane multiple

    if G == 2:
        # PAIRED bias: kernel iteration j covers windows (2j, 2j+1) side by
        # side; token i = r*2ws + w (w < 2ws spans both windows). Gather the
        # per-window bias into that order and put -1e9 on every cross-window
        # entry — exactly the padded-key mechanism, so each window's softmax
        # is untouched. The gather is jnp (differentiable: TinyViT's bias
        # tables are learnable); for host-constant tables XLA folds it.
        wq = np.arange(2 * window)
        tok = (np.arange(window)[:, None] * window
               + (wq[None, :] % window)).reshape(NN)   # local id in window
        wid = np.tile(wq // window, window)             # which of the pair
        same = jnp.asarray(wid[:, None] == wid[None, :])
        bias2 = jnp.where(
            same, bias.astype(jnp.float32)[:, tok[:, None], tok[None, :]],
            -1e9)
        bias_p = jnp.pad(bias2, ((0, 0), (0, 0), (0, KP - NN)),
                         constant_values=-1e9)
        mask_p = None
        if mask is not None:
            assert mask.shape == (nH * nW, N, N), (mask.shape, nH, nW, N)
            m5 = mask.astype(jnp.float32).reshape(nH, nW // 2, 2, N, N)
            pm = m5[:, :, wid[:, None], tok[:, None], tok[None, :]]
            pm = jnp.where(same, pm, 0.0)   # cross-window already -1e9 biased
            mask_p = jnp.pad(pm.reshape(nH * nW // 2, NN, NN),
                             ((0, 0), (0, 0), (0, KP - NN)))
    else:
        # padded keys get -1e9 bias so their softmax weight is exactly 0
        bias_p = jnp.pad(bias.astype(jnp.float32),
                         ((0, 0), (0, 0), (0, KP - N)), constant_values=-1e9)
        mask_p = None
        if mask is not None:
            assert mask.shape == (nH * nW, N, N), (mask.shape, nH, nW, N)
            mask_p = jnp.pad(mask.astype(jnp.float32),
                             ((0, 0), (0, 0), (0, KP - N)))
    qb_p = None
    if qkv_bias is not None:
        assert qkv_bias.shape == (L,), (qkv_bias.shape, L)
        qb_p = qkv_bias.astype(qkv.dtype)[None, :]         # (1, L)
    pv_fold = PV_FOLD_NORM if PV_FOLD_NORM is not None \
        else layout == "qkv_major"
    statics = (window, heads, kd, dv, layout, interpret, pv_fold, G)
    return _fwa(statics, qkv, bias_p, mask_p, qb_p)
