"""RetinaNet downstream: anchor/assigner/coder parity vs straight-line
ports of the vendored mmdet sources, plus end-to-end train+AP on a
synthetic COCO directory."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models.retinanet import (bbox2delta, delta2bbox,
                                        gen_base_anchors, grid_anchors,
                                        max_iou_assign, retina_anchors)


def np_gen_base_anchors(base_size, scales, ratios):
    """anchor_generator.py:18-43 straight-line port."""
    w = h = base_size
    x_ctr = 0.5 * (w - 1)
    y_ctr = 0.5 * (h - 1)
    h_ratios = np.sqrt(np.asarray(ratios))
    w_ratios = 1 / h_ratios
    ws = (w * w_ratios[:, None] * np.asarray(scales)[None, :]).reshape(-1)
    hs = (h * h_ratios[:, None] * np.asarray(scales)[None, :]).reshape(-1)
    return np.stack([x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
                     x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)],
                    axis=-1).round()


def np_assign(overlaps, pos_thr=0.5, neg_thr=0.4, min_pos_iou=0.0):
    """max_iou_assigner.py:93-147 (gt_max_assign_all) — overlaps (G, A);
    returns 1-based gt assignment, 0 = negative, -1 = ignore."""
    num_gts, num_bboxes = overlaps.shape
    assigned = np.full(num_bboxes, -1, np.int64)
    max_overlaps = overlaps.max(axis=0)
    argmax_overlaps = overlaps.argmax(axis=0)
    gt_max_overlaps = overlaps.max(axis=1)
    assigned[(max_overlaps >= 0) & (max_overlaps < neg_thr)] = 0
    pos = max_overlaps >= pos_thr
    assigned[pos] = argmax_overlaps[pos] + 1
    for i in range(num_gts):
        if gt_max_overlaps[i] >= min_pos_iou:
            inds = overlaps[i, :] == gt_max_overlaps[i]
            assigned[inds] = i + 1
    return assigned


def _iou_plus1(a, b):
    area = lambda x: (x[:, 2] - x[:, 0] + 1) * (x[:, 3] - x[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area(a)[:, None] + area(b)[None, :] - inter)


class TestAnchors:
    def test_base_anchors_match_mmdet(self):
        scales = 4 * np.array([2 ** (i / 3) for i in range(3)])
        for s in (8, 16, 32, 64, 128):
            got = gen_base_anchors(s, scales, (0.5, 1.0, 2.0))
            want = np_gen_base_anchors(s, scales, (0.5, 1.0, 2.0))
            np.testing.assert_array_equal(got, want)

    def test_grid_order_matches_mmdet(self):
        """shift layout: anchors fastest, x before y (anchor_generator.py
        _meshgrid + view(-1, 4))."""
        base = gen_base_anchors(8, [4.0], [1.0])
        g = grid_anchors(base, 2, 3, 8)
        assert g.shape == (6, 4)
        # row-major over (y, x): second anchor shifted by stride in x
        np.testing.assert_array_equal(g[1] - g[0], [8, 0, 8, 0])
        np.testing.assert_array_equal(g[3] - g[0], [0, 8, 0, 8])

    def test_total_count(self):
        a = retina_anchors(128)
        assert a.shape == (sum((128 // s if 128 % s == 0 else 128 // s + 1)
                               ** 2 * 9 for s in (8, 16, 32, 64, 128)), 4)


class TestCoder:
    def test_roundtrip_and_reference_formulas(self):
        rng = np.random.RandomState(0)
        props = np.abs(rng.rand(20, 2) * 50)
        props = np.concatenate([props, props + rng.rand(20, 2) * 60 + 5], 1)
        gt = np.abs(rng.rand(20, 2) * 50)
        gt = np.concatenate([gt, gt + rng.rand(20, 2) * 60 + 5], 1)
        d = np.asarray(bbox2delta(jnp.asarray(props), jnp.asarray(gt)))
        # reference formulas (transforms.py:6-31)
        pw = props[:, 2] - props[:, 0] + 1
        ph = props[:, 3] - props[:, 1] + 1
        gw = gt[:, 2] - gt[:, 0] + 1
        gh = gt[:, 3] - gt[:, 1] + 1
        np.testing.assert_allclose(d[:, 2], np.log(gw / pw), rtol=1e-5)
        np.testing.assert_allclose(d[:, 3], np.log(gh / ph), rtol=1e-5)
        back = np.asarray(delta2bbox(jnp.asarray(props), jnp.asarray(d)))
        np.testing.assert_allclose(back, gt, atol=1e-3)


class TestAssigner:
    def test_matches_mmdet_loop(self):
        rng = np.random.RandomState(1)
        anchors = retina_anchors(64)[::7]          # subsample for speed
        gts = np.asarray([[5, 5, 30, 30], [20, 25, 60, 55], [40, 2, 62, 30]],
                         np.float32)
        labelsless = np_assign(_iou_plus1(gts, anchors))
        got = np.asarray(max_iou_assign(
            jnp.asarray(anchors), jnp.asarray(gts),
            jnp.ones(3, bool)))
        # convention map: ref 0 (neg) == ours -1; ref -1 (ignore) == ours -2;
        # ref i+1 == ours i
        want = np.where(labelsless > 0, labelsless - 1,
                        np.where(labelsless == 0, -1, -2))
        np.testing.assert_array_equal(got, want)

    def test_padded_gts_ignored(self):
        anchors = retina_anchors(64)[::13]
        gts = np.asarray([[5, 5, 30, 30], [0, 0, 0, 0]], np.float32)
        valid = np.asarray([True, False])
        got = np.asarray(max_iou_assign(jnp.asarray(anchors),
                                        jnp.asarray(gts), jnp.asarray(valid)))
        assert not np.any(got == 1)                # padded gt never assigned


class TestEndToEnd:
    def test_train_and_eval_on_synthetic_coco(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_coco_eval import _write_synthetic_coco
        from cream_tpu.cli.train_retinanet import main
        img_dir, ann = _write_synthetic_coco(str(tmp_path))
        out = str(tmp_path / "r.json")
        res = main(["--cpu", "--steps", "2", "--batch-size", "4",
                    "--num-classes", "5", "--canvas", "96", "--resize", "64",
                    "--max-boxes", "8",
                    "--coco-img-dir", img_dir, "--coco-ann", ann,
                    "--out", out])
        assert "metrics" in res
        assert np.isfinite(res["history"][-1]["total"])
        for k in ("AP", "AP50", "AR100"):
            assert k in res["metrics"]


class TestNASBackbones:
    """Detection-NAS composition (VERDICT #31 / CDARTS_detection parity):
    RetinaNet over Cream-searched and DARTS-searched backbones — the
    reference trains NAS-found mobile backbones on COCO via
    CDARTS/CDARTS_detection/mmdet/models/backbones/."""

    def _fwd(self, model, size=64):
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.key(0), x, train=False)
        cls, reg = jax.jit(
            lambda v, x: model.apply(v, x, train=False))(variables, x)
        return cls, reg

    def test_cream_backbone_levels(self):
        from cream_tpu.models import create_model
        from cream_tpu.models.retinanet import anchors_per_level
        model = create_model("retinanet_cream", arch="cream_14",
                             num_classes=6)
        cls, reg = self._fwd(model)
        assert cls.shape[-1] == 6 and reg.shape[-1] == 4
        # anchors over ALL FIVE RETINA_STRIDES levels (8..128)
        assert cls.shape[1] == sum(anchors_per_level(64))

    def test_cream_flat_supernet_arch(self):
        # straight out of evolution/cream search: flat -1-padded form
        from cream_tpu.models import create_model
        flat = [3, -1, -1, -1, 3, 3, -1, -1, 3, 3, -1, -1, 3, -1, -1, -1,
                3, 3, -1, -1]
        model = create_model("retinanet_cream", arch=flat, num_classes=6)
        cls, _ = self._fwd(model)
        assert cls.shape[-1] == 6

    def test_cdarts_backbone(self):
        from cream_tpu.models import create_model
        g = ("Genotype(normal=[[('sep_conv_3x3', 1), ('skip_connect', 0)],"
             " [('sep_conv_3x3', 0), ('skip_connect', 2)]],"
             " normal_concat=range(2, 4),"
             " reduce=[[('max_pool_3x3', 1), ('avg_pool_3x3', 0)],"
             " [('max_pool_3x3', 1), ('dil_conv_3x3', 2)]],"
             " reduce_concat=range(2, 4))")
        model = create_model("retinanet_cdarts", genotypes=[g, g, g],
                             num_classes=6, init_channels=8)
        cls, reg = self._fwd(model)
        assert cls.shape[-1] == 6 and reg.shape[-1] == 4
        from cream_tpu.models.retinanet import anchors_per_level
        assert cls.shape[1] == sum(anchors_per_level(64))
