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
