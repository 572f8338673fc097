"""NMS / RoIAlign vs straight-line numpy ports of the vendored mmdet CUDA
kernels (CDARTS_detection/mmdet/ops/{nms,roi_align}/src/*.cu)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.ops.detection import iou_matrix, nms, roi_align


def np_greedy_nms(boxes, scores, thresh, plus1):
    """Independent greedy NMS (nms_kernel.cu semantics)."""
    off = 1.0 if plus1 else 0.0
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            w = max(xx2 - xx1 + off, 0.0)
            h = max(yy2 - yy1 + off, 0.0)
            inter = w * h
            sa = (boxes[i, 2] - boxes[i, 0] + off) * (boxes[i, 3] - boxes[i, 1] + off)
            sb = (boxes[j, 2] - boxes[j, 0] + off) * (boxes[j, 3] - boxes[j, 1] + off)
            if inter / (sa + sb - inter) > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def np_bilinear(img, y, x):
    """roi_align_kernel.cu:bilinear_interpolate, per channel."""
    H, W = img.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(img.shape[2], img.dtype)
    y, x = max(y, 0.0), max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= H - 1:
        y_high = y_low = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_high = x_low = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * img[y_low, x_low] + hy * lx * img[y_low, x_high]
            + ly * hx * img[y_high, x_low] + ly * lx * img[y_high, x_high])


def np_roi_align(features, rois, out_size, scale, sample_num, plus1):
    """roi_align_kernel.cu:ROIAlignForward, NHWC."""
    ph, pw = out_size
    off = 1.0 if plus1 else 0.0
    R = rois.shape[0]
    C = features.shape[-1]
    out = np.zeros((R, ph, pw, C), np.float32)
    for r in range(R):
        b = int(rois[r, 0])
        x1, y1 = rois[r, 1] * scale, rois[r, 2] * scale
        x2, y2 = (rois[r, 3] + off) * scale, (rois[r, 4] + off) * scale
        rw, rh = max(x2 - x1, 0.0), max(y2 - y1, 0.0)
        bh, bw = rh / ph, rw / pw
        for p in range(ph):
            for q in range(pw):
                acc = np.zeros(C, np.float32)
                for iy in range(sample_num):
                    yy = y1 + p * bh + (iy + 0.5) * bh / sample_num
                    for ix in range(sample_num):
                        xx = x1 + q * bw + (ix + 0.5) * bw / sample_num
                        acc += np_bilinear(features[b], yy, xx)
                out[r, p, q] = acc / (sample_num * sample_num)
    return out


class TestNMS:
    @pytest.mark.parametrize("plus1", [True, False])
    def test_matches_greedy_oracle(self, plus1):
        rng = np.random.default_rng(0)
        N = 60
        xy = rng.uniform(0, 50, (N, 2))
        wh = rng.uniform(5, 25, (N, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.random(N).astype(np.float32)
        for thresh in (0.3, 0.5, 0.7):
            ref = np_greedy_nms(boxes, scores, thresh, plus1)
            idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                             thresh, max_outputs=N, legacy_plus1=plus1)
            got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid))
                   if v]
            assert got == ref

    def test_fixed_output_size_and_order(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                             [50, 50, 60, 60]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        idx, valid = nms(boxes, scores, 0.5, max_outputs=2)
        assert idx.shape == (2,) and valid.shape == (2,)
        assert list(np.asarray(idx)) == [0, 2]
        assert list(np.asarray(valid)) == [True, True]

    def test_iou_matrix_plus1(self):
        a = jnp.asarray([[0, 0, 9, 9]], jnp.float32)   # 10x10 in +1 mode
        got = iou_matrix(a, a, legacy_plus1=True)
        assert float(got[0, 0]) == 1.0


class TestRoIAlign:
    @pytest.mark.parametrize("plus1", [True, False])
    def test_matches_kernel_oracle(self, plus1):
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
        rois = np.asarray([
            [0, 4.0, 4.0, 40.0, 28.0],
            [1, 0.0, 0.0, 63.0, 47.0],
            [0, 10.5, 7.25, 30.0, 20.0],
            [1, 60.0, 44.0, 63.0, 47.0],     # boundary-hugging
        ], np.float32)
        ref = np_roi_align(feats, rois, (7, 7), 0.25, 2, plus1)
        got = roi_align(jnp.asarray(feats), jnp.asarray(rois), (7, 7),
                        0.25, sample_num=2, legacy_plus1=plus1)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5,
                                   rtol=1e-5)

    def test_gradients_flow(self):
        feats = jnp.ones((1, 8, 8, 2))
        rois = jnp.asarray([[0, 0.0, 0.0, 31.0, 31.0]], jnp.float32)

        def f(x):
            return roi_align(x, rois, (2, 2), 0.25).sum()

        g = jax.grad(f)(feats)
        assert float(jnp.abs(g).sum()) > 0
        assert np.isfinite(np.asarray(g)).all()


class TestSigmoidFocalLoss:
    def test_matches_kernel_semantics(self):
        """Exact port of sigmoid_focal_loss_cuda.cu: targets are 1..C class
        ids, 0 = all-negative, <0 = ignored."""
        from cream_tpu.train.detection import sigmoid_focal_loss
        rng = np.random.default_rng(2)
        x = rng.standard_normal((6, 4)).astype(np.float32)
        t = np.asarray([0, 1, 4, 2, -1, 3])
        out = np.asarray(sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t)))
        p = 1 / (1 + np.exp(-x))
        ref = np.zeros_like(x)
        for n in range(6):
            for d in range(4):
                if t[n] == d + 1:
                    ref[n, d] = -0.25 * (1 - p[n, d]) ** 2 * np.log(p[n, d])
                elif t[n] >= 0:
                    ref[n, d] = -0.75 * p[n, d] ** 2 * np.log(1 - p[n, d])
        np.testing.assert_allclose(out, ref, atol=1e-5)
        assert (out[4] == 0).all()                 # ignored row
        g = jax.grad(lambda l: sigmoid_focal_loss(l, jnp.asarray(t)).sum())(
            jnp.asarray(x))
        assert np.isfinite(np.asarray(g)).all()


def np_deform_conv(x, offset, weight, mask, stride, pad, dil, dg):
    """Straight-line port of deformable_im2col + GEMM (NHWC)."""
    B, H, W, C = x.shape
    kh, kw, _, O = weight.shape
    K = kh * kw
    Ho = (H + 2 * pad - (dil * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * pad - (dil * (kw - 1) + 1)) // stride + 1
    off = offset.reshape(B, Ho, Wo, dg, K, 2)
    msk = mask.reshape(B, Ho, Wo, dg, K) if mask is not None else None
    cpg = C // dg
    out = np.zeros((B, Ho, Wo, O), np.float32)

    def bil(img, y, x_):
        if y <= -1 or y >= H or x_ <= -1 or x_ >= W:
            return np.zeros(img.shape[-1], np.float32)
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        ly, lx = y - y0, x_ - x0
        v = np.zeros(img.shape[-1], np.float32)
        for (yy, xx, w) in ((y0, x0, (1 - ly) * (1 - lx)),
                            (y0, x0 + 1, (1 - ly) * lx),
                            (y0 + 1, x0, ly * (1 - lx)),
                            (y0 + 1, x0 + 1, ly * lx)):
            if 0 <= yy < H and 0 <= xx < W:
                v += w * img[yy, xx]
        return v

    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                acc = np.zeros(O, np.float32)
                for ky in range(kh):
                    for kx in range(kw):
                        t = ky * kw + kx
                        for g in range(dg):
                            y = i * stride - pad + ky * dil + off[b, i, j, g, t, 0]
                            xx = j * stride - pad + kx * dil + off[b, i, j, g, t, 1]
                            s = bil(x[b, :, :, g * cpg:(g + 1) * cpg], y, xx)
                            if msk is not None:
                                s = s * msk[b, i, j, g, t]
                            acc += s @ weight[ky, kx, g * cpg:(g + 1) * cpg]
                out[b, i, j] = acc
    return out


class TestDeformConv:
    @pytest.mark.parametrize("dg,stride,use_mask",
                             [(1, 1, False), (1, 2, True), (2, 1, True)])
    def test_matches_im2col_oracle(self, dg, stride, use_mask):
        from cream_tpu.ops.detection import deform_conv2d
        rng = np.random.default_rng(0)
        B, H, W, C, O = 2, 9, 11, 8, 6
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, O)).astype(np.float32) * 0.2
        Ho = (H + 2 - 3) // stride + 1
        Wo = (W + 2 - 3) // stride + 1
        offset = (rng.standard_normal((B, Ho, Wo, dg * 9 * 2)) * 2.0
                  ).astype(np.float32)
        mask = rng.random((B, Ho, Wo, dg * 9)).astype(np.float32) \
            if use_mask else None
        ref = np_deform_conv(x, offset, w, mask, stride, 1, 1, dg)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                            jnp.asarray(w),
                            jnp.asarray(mask) if use_mask else None,
                            stride=stride, padding=1, dilation=1,
                            deformable_groups=dg)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4,
                                   rtol=1e-4)

    def test_zero_offset_equals_conv(self):
        """With zero offsets (and no mask) DCN is an ordinary conv."""
        from cream_tpu.ops.detection import deform_conv2d
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        w = rng.standard_normal((3, 3, 4, 5)).astype(np.float32)
        offset = np.zeros((1, 8, 8, 18), np.float32)
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                            jnp.asarray(w))
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_gradients_flow_to_offsets(self):
        from cream_tpu.ops.detection import deform_conv2d
        x = jnp.ones((1, 6, 6, 4))
        w = jnp.ones((3, 3, 4, 2)) * 0.1
        offset = jnp.full((1, 6, 6, 18), 0.3)

        g = jax.grad(lambda o: deform_conv2d(x, o, w).sum())(offset)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def np_soft_nms(boxes_scores, iou_thr, method=1, sigma=0.5, min_score=1e-3):
    """Straight-line port of soft_nms_cpu.pyx:22-128."""
    boxes = boxes_scores.copy().astype(np.float32)
    N = boxes.shape[0]
    inds = np.arange(N)
    # the pyx 'for i in range(N)' is a C loop re-checking the SHRINKING N
    i = -1
    while i + 1 < N:
        i += 1
        maxpos = i + int(np.argmax(boxes[i:N, 4]))
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        inds[[i, maxpos]] = inds[[maxpos, i]]
        tx1, ty1, tx2, ty2 = boxes[i, :4]
        pos = i + 1
        while pos < N:
            x1, y1, x2, y2, s = boxes[pos]
            area = (x2 - x1 + 1) * (y2 - y1 + 1)
            iw = min(tx2, x2) - max(tx1, x1) + 1
            if iw > 0:
                ih = min(ty2, y2) - max(ty1, y1) + 1
                if ih > 0:
                    ua = (tx2 - tx1 + 1) * (ty2 - ty1 + 1) + area - iw * ih
                    ov = iw * ih / ua
                    if method == 1:
                        weight = 1 - ov if ov > iou_thr else 1
                    elif method == 2:
                        weight = np.exp(-(ov * ov) / sigma)
                    else:
                        weight = 0 if ov > iou_thr else 1
                    boxes[pos, 4] = weight * boxes[pos, 4]
                    if boxes[pos, 4] < min_score:
                        boxes[pos] = boxes[N - 1]
                        inds[pos] = inds[N - 1]
                        N -= 1
                        pos -= 1
            pos += 1
    return boxes[:N], inds[:N]


class TestSoftNMS:
    @pytest.mark.parametrize("method,mid", [("linear", 1), ("gaussian", 2),
                                            ("hard", 3)])
    def test_matches_pyx_oracle(self, method, mid):
        from cream_tpu.ops.detection import soft_nms
        rng = np.random.RandomState(0)
        n = 40
        ctr = rng.uniform(10, 90, (n, 2))
        wh = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        ref_boxes, ref_inds = np_soft_nms(
            np.concatenate([boxes, scores[:, None]], 1), 0.3, method=mid)
        order, new_scores, count = jax.jit(
            lambda b, s: soft_nms(b, s, 0.3, method=method))(
            jnp.asarray(boxes), jnp.asarray(scores))
        count = int(count)
        assert count == len(ref_inds)
        # the pyx's swap-delete reorders survivors it has not yet selected;
        # selection ORDER and per-box decayed scores must match exactly
        got = {int(i): float(s) for i, s in
               zip(np.asarray(order[:count]), np.asarray(new_scores[:count]))}
        want = {int(i): float(b[4]) for b, i in zip(ref_boxes, ref_inds)}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=1e-5, rtol=1e-5)


def np_roi_pool(features_nchw, rois, out_size, scale):
    """Straight-line port of roi_pool_kernel.cu:17-79."""
    B, C, H, W = features_nchw.shape
    ph, pw = out_size
    R = rois.shape[0]
    out = np.zeros((R, C, ph, pw), np.float32)
    for n in range(R):
        # all arithmetic in float32 like the scalar_t=float CUDA kernel
        f32 = np.float32
        b = int(rois[n, 0])
        rx1 = f32(rois[n, 1] * f32(scale))
        ry1 = f32(rois[n, 2] * f32(scale))
        rx2 = f32((rois[n, 3] + 1) * f32(scale))
        ry2 = f32((rois[n, 4] + 1) * f32(scale))
        rw, rh = f32(rx2 - rx1), f32(ry2 - ry1)
        if rw <= 0 or rh <= 0:
            continue
        bw, bh = f32(rw / pw), f32(rh / ph)
        for c in range(C):
            for py in range(ph):
                for px in range(pw):
                    y1b = min(max(int(np.floor(f32(py * bh + ry1))), 0), H)
                    y2b = min(max(int(np.ceil(f32(f32((py + 1) * bh) + ry1))), 0), H)
                    x1b = min(max(int(np.floor(f32(px * bw + rx1))), 0), W)
                    x2b = min(max(int(np.ceil(f32(f32((px + 1) * bw) + rx1))), 0), W)
                    region = features_nchw[b, c, y1b:y2b, x1b:x2b]
                    out[n, c, py, px] = region.max() if region.size else 0.0
    return out


class TestRoIPool:
    def test_matches_kernel_oracle(self):
        from cream_tpu.ops.detection import roi_pool
        rng = np.random.RandomState(1)
        x = rng.randn(2, 24, 32, 8).astype(np.float32)
        # geometry avoids exact-integer bin edges: XLA's allow-excess-
        # precision may evaluate f32 chains wider, so a bin edge landing
        # EXACTLY on an integer can ceil differently than strict fp32 — a
        # one-row boundary artifact, not a semantics difference
        rois = np.array([[0, 2.3, 3.1, 20.0, 18.5],
                         [1, 0.0, 0.0, 30.0, 22.0],
                         [0, 10.2, 5.5, 12.9, 8.1],
                         [1, 25.0, 20.0, 24.0, 19.0]],   # malformed -> 0
                        np.float32)
        got = jax.jit(lambda f, r: roi_pool(f, r, (7, 7), 0.5))(
            jnp.asarray(x), jnp.asarray(rois))
        want = np_roi_pool(x.transpose(0, 3, 1, 2), rois, (7, 7), 0.5)
        np.testing.assert_allclose(np.asarray(got),
                                   want.transpose(0, 2, 3, 1),
                                   atol=1e-6)


class TestMaskedConv:
    def test_matches_gather_scatter_semantics(self):
        """Oracle = the functions/masked_conv.py:11-50 path: im2col at
        masked positions, GEMM + bias, scatter into a zero tensor."""
        from cream_tpu.ops.detection import masked_conv2d
        rng = np.random.RandomState(2)
        H = W = 10
        Cin, Cout, k, pad = 4, 6, 3, 1
        x = rng.randn(1, Cin, H, W).astype(np.float32)
        wgt = rng.randn(Cout, Cin, k, k).astype(np.float32)
        bias = rng.randn(Cout).astype(np.float32)
        mask = (rng.rand(1, H, W) > 0.6).astype(np.float32)

        out = np.zeros((1, Cout, H, W), np.float32)
        idx = np.nonzero(mask[0] > 0)
        xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        for h, w in zip(*idx):
            col = xp[0, :, h:h + k, w:w + k].reshape(-1)
            out[0, :, h, w] = wgt.reshape(Cout, -1) @ col + bias

        got = jax.jit(lambda a, m, wt, b: masked_conv2d(a, m, wt, b, pad))(
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(mask),
            jnp.asarray(wgt.transpose(2, 3, 1, 0)), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got),
                                   out.transpose(0, 2, 3, 1), atol=1e-4)
