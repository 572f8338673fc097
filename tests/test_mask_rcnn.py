"""Mask R-CNN downstream: sampler/target/loss semantics vs the mmdet
contracts (random_sampler.py, bbox_head get_target, fcn_mask_head), mask
rasterization/IoU, and end-to-end train+AP (bbox+segm) on a synthetic
COCO directory."""
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models.mask_rcnn import (BBOX_STDS, mask_loss,
                                        mask_rcnn_anchor_levels,
                                        mask_rcnn_anchors,
                                        multilevel_roi_align, random_sample,
                                        rcnn_stage)
from cream_tpu.models.retinanet import bbox2delta


class TestRandomSample:
    def test_caps_and_composition(self):
        rng = jax.random.PRNGKey(0)
        pos = jnp.zeros(100, bool).at[:10].set(True)
        neg = jnp.zeros(100, bool).at[50:].set(True)
        idx, is_pos, keep = random_sample(rng, pos, neg, 16, 0.25)
        # pos cap = 4, all available (10 > 4): exactly 4 positives
        assert int(is_pos.sum()) == 4
        assert int(keep.sum()) == 16
        assert bool(jnp.all(pos[idx[is_pos]]))
        assert bool(jnp.all(neg[idx[keep & ~is_pos]]))

    def test_scarce_positives_fill_with_negatives(self):
        rng = jax.random.PRNGKey(1)
        pos = jnp.zeros(64, bool).at[3].set(True)
        neg = jnp.zeros(64, bool).at[32:].set(True)
        idx, is_pos, keep = random_sample(rng, pos, neg, 16, 0.5)
        assert int(is_pos.sum()) == 1
        assert int(keep.sum()) == 16                 # 1 pos + 15 neg
        # kept entries are packed first, positives leading (stable sort)
        assert bool(is_pos[0])
        assert bool(jnp.all(keep[:16]))

    def test_positives_always_in_leading_cap_slots(self):
        """The mask head relies on every kept positive landing in the first
        num*pos_fraction slots."""
        for seed in range(5):
            rng = jax.random.PRNGKey(seed)
            pos = jax.random.bernoulli(rng, 0.1, (200,))
            neg = ~pos & jax.random.bernoulli(jax.random.fold_in(rng, 1),
                                              0.5, (200,))
            idx, is_pos, keep = random_sample(rng, pos, neg, 32, 0.25)
            n_pos = int(is_pos.sum())
            assert n_pos <= 8
            assert bool(jnp.all(is_pos[:n_pos]))     # packed at the front
            assert not bool(jnp.any(is_pos[8:]))


class TestRcnnStage:
    def test_gt_as_proposal_gets_its_label_and_zero_delta(self):
        gt = jnp.asarray([[10., 10., 60., 80.]])
        gl = jnp.asarray([7], jnp.int32)
        gv = jnp.ones(1, bool)
        props = jnp.zeros((8, 4))                    # junk proposals
        pv = jnp.zeros(8, bool)
        tgt = rcnn_stage(jax.random.PRNGKey(0), props, pv, gt, gl, gv,
                         num_classes=10, num=8, pos_fraction=0.5)
        pos = np.asarray(tgt["pos"])
        assert pos.sum() == 1                        # only the gt-as-proposal
        labels = np.asarray(tgt["labels"])
        assert labels[pos.argmax()] == 7
        np.testing.assert_allclose(
            np.asarray(tgt["reg_targets"])[pos.argmax()], 0.0, atol=1e-5)
        # background sampled rois labelled num_classes, pads -1
        keep = np.asarray(tgt["valid"])
        assert np.all(labels[keep & ~pos] == 10)
        assert np.all(labels[~keep] == -1)

    def test_reg_targets_are_std_normalized_deltas(self):
        gt = jnp.asarray([[20., 20., 100., 120.]])
        gl = jnp.asarray([3], jnp.int32)
        gv = jnp.ones(1, bool)
        prop = jnp.asarray([[24., 16., 96., 110.]])  # IoU > .5 with gt
        tgt = rcnn_stage(jax.random.PRNGKey(0), prop, jnp.ones(1, bool),
                         gt, gl, gv, num_classes=5, num=4, pos_fraction=1.0)
        pos = np.asarray(tgt["pos"])
        rois = np.asarray(tgt["rois"])[pos]
        want = np.asarray(bbox2delta(jnp.asarray(rois), gt)) / BBOX_STDS
        got = np.asarray(tgt["reg_targets"])[pos]
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestMultilevelRoiAlign:
    def test_level_routing_matches_mmdet_formula(self):
        """SingleRoIExtractor.map_roi_levels: lvl = floor(log2(sqrt(area)
        / 56 + 1e-6)) clamped to [0, 3]."""
        from cream_tpu.ops.detection import roi_align
        feats = [jnp.asarray(np.random.RandomState(i).randn(
            1, 64 // s * 4, 64 // s * 4, 8).astype(np.float32))
            for i, s in enumerate((4, 8, 16, 32))]
        # small roi (28x28 -> sqrt=28 -> lvl 0), large (448 -> lvl 3)
        rois = jnp.asarray([[0, 4., 4., 31., 31.],
                            [0, 0., 0., 447., 447.]], jnp.float32)
        out = multilevel_roi_align(feats, rois, 7)
        want0 = roi_align(feats[0], rois[:1], (7, 7), 1 / 4, sample_num=2)
        want1 = roi_align(feats[3], rois[1:], (7, 7), 1 / 32, sample_num=2)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want0[0]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want1[0]),
                                   rtol=1e-5)


class TestMaskLoss:
    def test_perfect_and_inverted_logits(self):
        """BCE on the gt-class channel against the RoIAligned gt mask: a
        rectangle roi over a rectangle mask gives ~0 loss for +/-20 logits
        of the right sign, large for the wrong sign."""
        G, M, C = 2, 28, 4
        hs = 32
        gt_masks = np.zeros((G, hs, hs), np.float32)
        gt_masks[0, 4:16, 4:16] = 1.0                # stride-4 frame
        gt_masks[1, 8:24, 8:24] = 1.0
        rois = jnp.asarray([[16., 16., 63., 63.]])   # image coords of mask 0
        assigned = jnp.asarray([0], jnp.int32)
        labels = jnp.asarray([2], jnp.int32)
        pos = jnp.ones(1, bool)
        crop_target = 1.0                            # roi interior is mask
        logits = np.full((1, M, M, C), -20.0, np.float32)
        logits[..., 2] = 20.0 * (2 * crop_target - 1)
        good = float(mask_loss(jnp.asarray(logits), rois, assigned, labels,
                               pos, jnp.asarray(gt_masks)))
        assert good < 1e-4
        bad = float(mask_loss(-jnp.asarray(logits), rois, assigned, labels,
                              pos, jnp.asarray(gt_masks)))
        assert bad > 10.0

    def test_negatives_do_not_contribute(self):
        G, M, C = 1, 14, 3
        gt_masks = jnp.zeros((G, 16, 16))
        rois = jnp.zeros((2, 4))
        logits = jnp.asarray(np.random.RandomState(0)
                             .randn(2, M, M, C).astype(np.float32)) * 50
        loss = mask_loss(logits, rois, jnp.zeros(2, jnp.int32),
                         jnp.zeros(2, jnp.int32), jnp.zeros(2, bool),
                         gt_masks)
        assert float(loss) == 0.0


class TestMaskEval:
    def test_mask_iou_and_segm_ap_perfect(self):
        from cream_tpu.train.coco_eval import evaluate_detections, iou_masks
        m1 = np.zeros((1, 16, 16), bool)
        m1[0, 2:10, 2:10] = True
        m2 = np.zeros((1, 16, 16), bool)
        m2[0, 6:14, 6:14] = True
        iou = iou_masks(m1, m2, np.zeros(1, bool))
        inter = 4 * 4
        union = 64 + 64 - inter
        np.testing.assert_allclose(iou[0, 0], inter / union)
        # crowd: inter / det area
        iouc = iou_masks(m1, m2, np.ones(1, bool))
        np.testing.assert_allclose(iouc[0, 0], inter / 64)
        gts = {1: {"boxes": np.asarray([[8., 8., 32., 32.]]),
                   "labels": np.asarray([1]), "masks": m1}}
        dts = {1: {"boxes": np.asarray([[8., 8., 32., 32.]]),
                   "labels": np.asarray([1]), "scores": np.asarray([0.9]),
                   "masks": m1}}
        res = evaluate_detections(gts, dts, mode="segm", mask_area_scale=16)
        assert res["AP"] == 1.0 and res["AP50"] == 1.0

    def test_rasterize_rect_polygon(self):
        from cream_tpu.data.coco import rasterize_instance
        seg = [[8.0, 8.0, 40.0, 8.0, 40.0, 24.0, 8.0, 24.0]]
        m = rasterize_instance(seg, 16, 16, 0.25, 0.25)
        assert m[3, 3] and m[5, 9]
        assert not m[0, 0] and not m[8, 8]
        # h-flip at original width 64: x -> 64 - x, same rect mirrored
        mf = rasterize_instance(seg, 16, 16, 0.25, 0.25, flip_w=64.0)
        np.testing.assert_array_equal(np.asarray(mf), np.asarray(m[:, ::-1]))

    def test_rle_decode(self):
        from cream_tpu.data.coco import decode_rle
        # 3x2 column-major: runs 1 off, 2 on, 3 off
        m = decode_rle([1, 2, 3], (3, 2))
        want = np.array([[False, False], [True, False], [True, False]])
        np.testing.assert_array_equal(m, want)


class TestEndToEnd:
    def test_train_and_eval_on_synthetic_coco(self, tmp_path):
        sys.path.insert(0, os.path.dirname(__file__))
        from test_coco_eval import _write_synthetic_coco
        from cream_tpu.cli.train_mask_rcnn import main
        img_dir, ann = _write_synthetic_coco(str(tmp_path))
        out = str(tmp_path / "r.json")
        res = main(["--cpu", "--steps", "2", "--batch-size", "4",
                    "--num-classes", "5", "--canvas", "96", "--resize", "64",
                    "--max-boxes", "8", "--proposals", "48",
                    "--rcnn-samples", "32", "--rpn-samples", "64",
                    "--max-dets", "16",
                    "--coco-img-dir", img_dir, "--coco-ann", ann,
                    "--out", out])
        assert np.isfinite(res["history"][-1]["total"])
        for k in ("bbox_AP", "bbox_AP50", "segm_AP", "segm_AP50"):
            assert k in res["metrics"]
        saved = json.load(open(out))
        assert "metrics" in saved
