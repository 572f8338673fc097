"""Detection ops: NMS and RoIAlign, TPU-native.

Rebuilds the mmdet CUDA ops the reference vendors for its detection
downstreams (CDARTS/CDARTS_detection/mmdet/ops/{nms,roi_align}/src/*.cu)
as jittable static-shape XLA programs:

  * nms — the greedy sweep over a precomputed (N, N) IoU matrix via
    lax.scan (the CUDA kernel's bitmask blocks do the same O(N^2) work);
    returns FIXED-SIZE indices + a validity mask instead of a dynamic list.
    `legacy_plus1=True` reproduces mmdet's pixel convention
    (w = x2 - x1 + 1, nms_kernel.cu:devIoU).
  * roi_align — fully vectorized bilinear sampling; exact port of
    roi_align_kernel.cu semantics: roi_end = (coord + 1) * spatial_scale
    (legacy mode), bins sampled at (i + .5)/n offsets, out-of-map points
    contribute 0, boundary clamping matches the kernel. Gradients come from
    AD over the gather weights (replacing the atomic-add backward kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray,
               legacy_plus1: bool = False) -> jnp.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    off = 1.0 if legacy_plus1 else 0.0
    area = lambda x: (x[:, 2] - x[:, 0] + off) * (x[:, 3] - x[:, 1] + off)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area(a)[:, None] + area(b)[None, :] - inter)


@functools.partial(jax.jit, static_argnames=("max_outputs", "legacy_plus1"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_outputs: int, legacy_plus1: bool = False):
    """Greedy NMS. Returns (indices (max_outputs,) into the ORIGINAL boxes,
    valid (max_outputs,) bool), highest-score first. Static shapes: callers
    pad/truncate to max_outputs (mmdet's dynamic keep-list is host logic)."""
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    sb = boxes[order]
    iou = iou_matrix(sb, sb, legacy_plus1)
    rng_n = jnp.arange(N)

    def body(keep, i):
        sup = (iou[i] > iou_threshold) & (rng_n > i) & keep[i]
        return keep & ~sup, None

    keep, _ = lax.scan(body, jnp.ones((N,), bool), rng_n)
    # kept entries first, already in descending-score order
    rank = jnp.argsort(jnp.where(keep, rng_n, N + rng_n))[:max_outputs]
    return order[rank], keep[rank]


def _bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray
              ) -> jnp.ndarray:
    """img (H, W, C); y/x (...,) sample points with roi_align_kernel.cu
    boundary semantics. Returns (..., C)."""
    H, W = img.shape[:2]
    inside = (y >= -1.0) & (y <= H) & (x >= -1.0) & (x <= W)
    y = jnp.clip(y, 0.0)
    x = jnp.clip(x, 0.0)
    y_low = jnp.minimum(y.astype(jnp.int32), H - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), W - 1)
    y = jnp.where(y_low >= H - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x_low >= W - 1, x_low.astype(x.dtype), x)
    y_high = jnp.minimum(y_low + 1, H - 1)
    x_high = jnp.minimum(x_low + 1, W - 1)
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    g = lambda yy, xx: img[yy, xx]
    val = (hy * hx)[..., None] * g(y_low, x_low) \
        + (hy * lx)[..., None] * g(y_low, x_high) \
        + (ly * hx)[..., None] * g(y_high, x_low) \
        + (ly * lx)[..., None] * g(y_high, x_high)
    return jnp.where(inside[..., None], val, 0.0)


@functools.partial(jax.jit, static_argnames=("out_size", "sample_num",
                                             "legacy_plus1"))
def roi_align(features: jnp.ndarray, rois: jnp.ndarray, out_size: tuple,
              spatial_scale: float, sample_num: int = 2,
              legacy_plus1: bool = True) -> jnp.ndarray:
    """features (B, H, W, C) NHWC; rois (R, 5) [batch_idx, x1, y1, x2, y2]
    in input-image coordinates. Returns (R, ph, pw, C).

    legacy_plus1=True is the vendored mmdet convention
    (roi_align_kernel.cu:80-83: roi_end = (coord + 1) * scale); False gives
    the modern aligned=False torchvision behavior (end = coord * scale).
    sample_num must be > 0 (mmdet configs use 2); the adaptive ceil() mode
    is data-dependent and unjittable by design."""
    assert sample_num > 0, "adaptive sample_num=0 is not supported under jit"
    ph, pw = out_size
    R = rois.shape[0]
    batch_idx = rois[:, 0].astype(jnp.int32)
    off = 1.0 if legacy_plus1 else 0.0
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = (rois[:, 3] + off) * spatial_scale
    y2 = (rois[:, 4] + off) * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 0.0)
    roi_h = jnp.maximum(y2 - y1, 0.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    iy = (jnp.arange(sample_num) + 0.5) / sample_num          # (s,)
    grid_y = (y1[:, None, None] + (jnp.arange(ph)[None, :, None]
              + iy[None, None, :]) * bin_h[:, None, None])    # (R, ph, s)
    grid_x = (x1[:, None, None] + (jnp.arange(pw)[None, :, None]
              + iy[None, None, :]) * bin_w[:, None, None])    # (R, pw, s)

    def one_roi(b, gy, gx):
        img = features[b]                                     # (H, W, C)
        yy = gy[:, None, :, None]                             # (ph,1,s,1)
        xx = gx[None, :, None, :]                             # (1,pw,1,s)
        Y = jnp.broadcast_to(yy, (ph, pw, sample_num, sample_num))
        X = jnp.broadcast_to(xx, (ph, pw, sample_num, sample_num))
        vals = _bilinear(img, Y, X)                           # (ph,pw,s,s,C)
        return vals.mean(axis=(2, 3))

    return jax.vmap(one_roi)(batch_idx, grid_y, grid_x)


def _bilinear_flat(img2d: jnp.ndarray, H: int, W: int, y: jnp.ndarray,
                   x: jnp.ndarray) -> jnp.ndarray:
    """img2d (H*W, C); y/x (...,) points; deformable_im2col_bilinear
    semantics (zero outside (-1, H)x(-1, W), zero-padded corners)."""
    inside = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    ly, lx = y - y0, x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yy, xx, w):
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        v = jnp.take(img2d, idx.reshape(-1), axis=0).reshape(*idx.shape, -1)
        return v * (w * ok)[..., None]

    val = (tap(y0i, x0i, (1 - ly) * (1 - lx))
           + tap(y0i, x0i + 1, (1 - ly) * lx)
           + tap(y0i + 1, x0i, ly * (1 - lx))
           + tap(y0i + 1, x0i + 1, ly * lx))
    return val * inside[..., None]


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation",
                                             "deformable_groups"))
def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  mask: jnp.ndarray | None = None, stride: int = 1,
                  padding: int = 1, dilation: int = 1,
                  deformable_groups: int = 1) -> jnp.ndarray:
    """Deformable convolution (v1; pass `mask` for modulated v2), NHWC.

    Exact port of the vendored mmdet deformable_im2col
    (mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu:189-243): sample position
    (i, j) of tap (ky, kx) = (i*stride - pad + ky*dilation + dy,
    ...x analog...), bilinear with zero outside (-1, H); the im2col matrix
    then contracts with the weights on the MXU (one einsum replaces the
    col2im GEMM), and AD provides both input and offset gradients in place
    of the two handwritten backward kernels.

    x (B, H, W, C); offset (B, Ho, Wo, dg*kh*kw*2) with the reference's
    per-group (tap, (dy, dx)) channel order; weight HWIO (kh, kw, C, O);
    mask (B, Ho, Wo, dg*kh*kw) multiplies sampled values (modulated DCN —
    apply sigmoid before passing, as the reference module does).
    """
    B, H, W, C = x.shape
    kh, kw, wc, O = weight.shape
    assert wc == C, (wc, C)
    dg = deformable_groups
    K = kh * kw
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    off = offset.reshape(B, Ho, Wo, dg, K, 2)

    base_y = (jnp.arange(Ho) * stride - padding)[:, None, None] \
        + (jnp.arange(kh) * dilation)[None, None, :].repeat(kw, -1) \
        .reshape(1, 1, K)                                   # (Ho, 1, K)
    base_x = (jnp.arange(Wo) * stride - padding)[:, None] \
        + jnp.tile(jnp.arange(kw) * dilation, kh)[None, :]  # (Wo, K)
    # positions per (B, Ho, Wo, dg, K)
    ys = base_y.reshape(1, Ho, 1, 1, K) + off[..., 0]
    xs = base_x.reshape(1, 1, Wo, 1, K) + off[..., 1]

    def per_image(img, ys_i, xs_i, mask_i):
        img2d = img.reshape(H * W, C)
        cols = _bilinear_flat(img2d, H, W, ys_i, xs_i)   # (Ho,Wo,dg,K,C)
        if mask_i is not None:
            cols = cols * mask_i[..., None]
        if dg == 1:
            cols = cols[:, :, 0]                          # (Ho, Wo, K, C)
        else:
            # group g's samples apply to its own channel slice
            cpg = C // dg
            cols = jnp.stack([
                cols[:, :, g, :, g * cpg:(g + 1) * cpg]
                for g in range(dg)], axis=-2)             # (Ho,Wo,K,dg,cpg)
            cols = cols.reshape(Ho, Wo, K, C)
        return cols

    mask_r = mask.reshape(B, Ho, Wo, dg, K) if mask is not None else None
    cols = jax.vmap(per_image)(
        x, jnp.broadcast_to(ys, (B, Ho, Wo, dg, K)),
        jnp.broadcast_to(xs, (B, Ho, Wo, dg, K)),
        mask_r if mask_r is not None else jnp.ones((B, Ho, Wo, dg, K),
                                                   x.dtype))
    wmat = weight.reshape(K, C, O)
    return jnp.einsum("bhwkc,kco->bhwo", cols, wmat,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             method: str = "linear", sigma: float = 0.5,
             min_score: float = 1e-3, max_out: int | None = None
             ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (mmdet/ops/nms/src/soft_nms_cpu.pyx:22-128), jit-compiled.

    The pyx walks the array selecting the max-score box, decaying every
    remaining box's score by a function of its IoU with the selection
    (linear 1-iou above the threshold / gaussian exp(-iou^2/sigma) / hard
    0), and drops boxes whose decayed score falls under `min_score`. The
    TPU form is a fixed-trip lax.fori_loop over a validity mask — same
    selection order and identical decayed scores, static shapes throughout
    (dropped/exhausted slots return index -1).

    Returns (order, new_scores, count): `order[:count]` are input indices in
    selection order with `new_scores[:count]` their decayed scores — the
    pyx's (boxes[:N, 4], inds[:N]) in fixed-size form. Uses the legacy +1
    box convention like the kernel.
    """
    n = boxes.shape[0]
    steps = n if max_out is None else min(max_out, n)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)

    def body(i, carry):
        cur_scores, valid, order, out_scores = carry
        masked = jnp.where(valid, cur_scores, -jnp.inf)
        sel = jnp.argmax(masked)
        any_valid = jnp.any(valid)
        order = order.at[i].set(jnp.where(any_valid, sel, -1))
        out_scores = out_scores.at[i].set(
            jnp.where(any_valid, cur_scores[sel], 0.0))
        valid = valid.at[sel].set(False)
        iw = jnp.minimum(x2[sel], x2) - jnp.maximum(x1[sel], x1) + 1
        ih = jnp.minimum(y2[sel], y2) - jnp.maximum(y1[sel], y1) + 1
        inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
        ov = inter / (areas[sel] + areas - inter)
        ov = jnp.where((iw > 0) & (ih > 0), ov, 0.0)
        if method == "linear":
            w = jnp.where(ov > iou_threshold, 1.0 - ov, 1.0)
        elif method == "gaussian":
            w = jnp.exp(-(ov * ov) / sigma)
        else:                                              # hard nms
            w = jnp.where(ov > iou_threshold, 0.0, 1.0)
        w = jnp.where(any_valid & valid, w, 1.0)
        cur_scores = cur_scores * w
        valid = valid & (cur_scores >= min_score)
        return cur_scores, valid, order, out_scores

    init = (scores.astype(jnp.float32), jnp.ones(n, bool),
            jnp.full(steps, -1, jnp.int32), jnp.zeros(steps, jnp.float32))
    _, _, order, out_scores = jax.lax.fori_loop(0, steps, body, init)
    count = jnp.sum(order >= 0)
    return order, out_scores, count


def roi_pool(features: jnp.ndarray, rois: jnp.ndarray, out_size: tuple,
             spatial_scale: float = 1.0) -> jnp.ndarray:
    """RoI max-pool (mmdet/ops/roi_pool/src/roi_pool_kernel.cu:17-79), NHWC.

    Static-binned: each output bin's integer bounds (floor/ceil of the
    fractional bin edges, clipped to the map) become a boolean row/column
    mask and the bin value is the max over the masked region — the
    data-dependent integer loops of the kernel turn into two outer-product
    masks and one masked reduce per bin, all static shapes. Empty bins are
    0, malformed rois (w/h <= 0) yield 0, matching the kernel's guards.

    features (B, H, W, C); rois (R, 5) = (batch_idx, x1, y1, x2, y2) in
    image coords; returns (R, ph, pw, C).
    """
    B, H, W, C = features.shape
    ph, pw = out_size

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        roi_x1 = roi[1] * spatial_scale
        roi_y1 = roi[2] * spatial_scale
        roi_x2 = (roi[3] + 1) * spatial_scale
        roi_y2 = (roi[4] + 1) * spatial_scale
        roi_w = roi_x2 - roi_x1
        roi_h = roi_y2 - roi_y1
        ok = (roi_w > 0) & (roi_h > 0)
        bw = roi_w / pw
        bh = roi_h / ph
        py = jnp.arange(ph, dtype=jnp.float32)
        px = jnp.arange(pw, dtype=jnp.float32)
        y1b = jnp.clip(jnp.floor(py * bh + roi_y1), 0, H).astype(jnp.int32)
        y2b = jnp.clip(jnp.ceil((py + 1) * bh + roi_y1), 0, H).astype(jnp.int32)
        x1b = jnp.clip(jnp.floor(px * bw + roi_x1), 0, W).astype(jnp.int32)
        x2b = jnp.clip(jnp.ceil((px + 1) * bw + roi_x1), 0, W).astype(jnp.int32)
        rows = jnp.arange(H)
        cols = jnp.arange(W)
        ymask = (rows[None, :] >= y1b[:, None]) & (rows[None, :] < y2b[:, None])
        xmask = (cols[None, :] >= x1b[:, None]) & (cols[None, :] < x2b[:, None])
        m = ymask[:, None, :, None] & xmask[None, :, None, :]  # (ph,pw,H,W)
        img = features[b]                                      # (H, W, C)
        vals = jnp.where(m[..., None], img[None, None], -jnp.inf)
        out = vals.max(axis=(2, 3))                            # (ph, pw, C)
        out = jnp.where(jnp.isfinite(out), out, 0.0)           # empty bin -> 0
        return jnp.where(ok, out, 0.0)

    return jax.vmap(one_roi)(rois.astype(jnp.float32)).astype(features.dtype)


def masked_conv2d(x: jnp.ndarray, mask: jnp.ndarray, weight: jnp.ndarray,
                  bias: jnp.ndarray, padding: int = 1) -> jnp.ndarray:
    """Masked conv (mmdet/ops/masked_conv/): conv computed only at mask>0
    positions, zeros (not bias) elsewhere, stride 1.

    The CUDA op gathers masked pixels with im2col, GEMMs, and scatters back
    (functions/masked_conv.py:11-50). On TPU the dense form wins — sparse
    gathers forfeit MXU density — and `where(mask, conv + bias, 0)` is
    exactly the op's semantics: positions outside the mask were never
    written, so they hold the output tensor's zero-init.

    x (B, H, W, C) NHWC; mask (B, H, W) or (1, H, W); weight HWIO; square
    kernels only (the reference computes out_w with kernel_h —
    masked_conv.py:30-33 — so it is square-only de facto).
    """
    kh, kw = weight.shape[:2]
    assert kh == kw, "reference masked_conv2d is square-kernel only"
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + bias.reshape(1, 1, 1, -1)
    return jnp.where((mask > 0)[..., None], out, 0.0).astype(x.dtype)
