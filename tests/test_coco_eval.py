"""Native COCO AP evaluator (train/coco_eval.py) + COCO DETR end-to-end.

Analytic scenarios with hand-computable AP values stand in for pycocotools
(absent in this environment); the end-to-end test drives cli/train_detr.py
on a synthetic COCO-format directory through train + AP eval.
"""
import json
import os

import numpy as np
import pytest

from cream_tpu.train.coco_eval import evaluate_detections, iou_xywh


def _box(x, y, w, h):
    return [x, y, w, h]


class TestIoU:
    def test_basic_and_crowd(self):
        dets = np.asarray([[0, 0, 10, 10]], np.float64)
        gts = np.asarray([[5, 5, 10, 10], [0, 0, 10, 10]], np.float64)
        iou = iou_xywh(dets, gts, np.asarray([False, False]))
        np.testing.assert_allclose(iou[0, 0], 25 / 175)
        np.testing.assert_allclose(iou[0, 1], 1.0)
        # crowd: inter / det area
        iou_c = iou_xywh(dets, gts, np.asarray([True, False]))
        np.testing.assert_allclose(iou_c[0, 0], 25 / 100)


class TestEvaluateDetections:
    def test_perfect_predictions(self):
        gts = {1: {"boxes": np.asarray([_box(10, 10, 20, 20),
                                        _box(50, 50, 40, 40)]),
                   "labels": np.asarray([1, 2])}}
        dts = {1: {"boxes": np.asarray([_box(10, 10, 20, 20),
                                        _box(50, 50, 40, 40)]),
                   "labels": np.asarray([1, 2]),
                   "scores": np.asarray([0.9, 0.8])}}
        m = evaluate_detections(gts, dts)
        assert m["AP"] == pytest.approx(1.0)
        assert m["AP50"] == pytest.approx(1.0)
        assert m["AR100"] == pytest.approx(1.0)

    def test_half_recall_ap(self):
        """One category, 2 GTs, 1 perfect det: PR curve = precision 1 up to
        recall 0.5 -> 101-pt AP = 51/101 at every IoU threshold."""
        gts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10),
                                        _box(100, 100, 10, 10)]),
                   "labels": np.asarray([1, 1])}}
        dts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10)]),
                   "labels": np.asarray([1]),
                   "scores": np.asarray([0.9])}}
        m = evaluate_detections(gts, dts)
        assert m["AP"] == pytest.approx(51 / 101)
        assert m["AR100"] == pytest.approx(0.5)

    def test_false_positive_ordering(self):
        """High-scoring FP before a TP: precision at recall 1.0 is 1/2,
        interpolated precision = 0.5 across all recall points -> AP 0.5."""
        gts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10)]),
                   "labels": np.asarray([1])}}
        dts = {1: {"boxes": np.asarray([_box(60, 60, 10, 10),
                                        _box(0, 0, 10, 10)]),
                   "labels": np.asarray([1, 1]),
                   "scores": np.asarray([0.9, 0.8])}}
        m = evaluate_detections(gts, dts)
        assert m["AP"] == pytest.approx(0.5)

    def test_iou_threshold_sensitivity(self):
        """Det with IoU ~0.6 vs GT: counts at thresholds .5/.55/.6, misses
        above -> AP = 3/10, AP50 = 1, AP75 = 0."""
        gts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10)]),
                   "labels": np.asarray([1])}}
        # [0,0,10,6] vs [0,0,10,10]: inter 60, union 100 -> IoU 0.6
        dts = {1: {"boxes": np.asarray([_box(0, 0, 10, 6.0)]),
                   "labels": np.asarray([1]),
                   "scores": np.asarray([0.9])}}
        m = evaluate_detections(gts, dts)
        # thresholds 0.5, 0.55, 0.6 pass, 0.65+ fail
        assert m["AP"] == pytest.approx(3 / 10)
        assert m["AP50"] == pytest.approx(1.0)
        assert m["AP75"] == pytest.approx(0.0)

    def test_crowd_gt_is_ignore(self):
        """A det matching only a crowd GT is neither TP nor FP; with no
        non-ignored GT of that category anywhere, the category is skipped."""
        gts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10),
                                        _box(50, 50, 10, 10)]),
                   "labels": np.asarray([1, 1]),
                   "iscrowd": np.asarray([1, 0])},
               }
        dts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10),
                                        _box(50, 50, 10, 10)]),
                   "labels": np.asarray([1, 1]),
                   "scores": np.asarray([0.9, 0.8])}}
        m = evaluate_detections(gts, dts)
        # crowd det ignored; the remaining det is a perfect match of the
        # single counted GT -> AP 1.0
        assert m["AP"] == pytest.approx(1.0)

    def test_area_ranges(self):
        gts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10),        # small
                                        _box(50, 50, 200, 200)]),  # large
                   "labels": np.asarray([1, 1])}}
        dts = {1: {"boxes": np.asarray([_box(0, 0, 10, 10)]),
                   "labels": np.asarray([1]),
                   "scores": np.asarray([0.9])}}
        m = evaluate_detections(gts, dts)
        assert m["APs"] == pytest.approx(1.0)
        assert m["APl"] == pytest.approx(0.0)


def _write_synthetic_coco(root, n_images=8, size=64):
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    from PIL import Image
    for i in range(n_images):
        fname = f"{i:06d}.png"
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, fname))
        images.append({"id": i + 1, "file_name": fname,
                       "width": size, "height": size})
        for _ in range(rng.randint(1, 4)):
            w, h = rng.randint(8, 24, 2)
            x = rng.randint(0, size - w)
            y = rng.randint(0, size - h)
            annotations.append({"id": aid, "image_id": i + 1,
                                "category_id": int(rng.randint(1, 4)),
                                "bbox": [float(x), float(y), float(w),
                                         float(h)],
                                "segmentation": [[float(x), float(y),
                                                  float(x + w), float(y),
                                                  float(x + w), float(y + h),
                                                  float(x), float(y + h)]],
                                "area": float(w * h), "iscrowd": 0})
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)]}
    ann_path = os.path.join(root, "instances.json")
    json.dump(ann, open(ann_path, "w"))
    return img_dir, ann_path


class TestCocoEndToEnd:
    def test_train_and_eval_on_coco_dir(self, tmp_path):
        from cream_tpu.cli.train_detr import main
        img_dir, ann = _write_synthetic_coco(str(tmp_path))
        out = str(tmp_path / "result.json")
        res = main(["--cpu", "--steps", "2", "--batch-size", "4",
                    "--num-classes", "5", "--num-queries", "8",
                    "--max-boxes", "8", "--hidden-dim", "32",
                    "--enc-layers", "1", "--dec-layers", "1",
                    "--enc-rpe2d", "", "--canvas", "96", "--resize", "64",
                    "--coco-img-dir", img_dir, "--coco-ann", ann,
                    "--out", out])
        assert "metrics" in res
        for k in ("AP", "AP50", "AP75", "APs", "APm", "APl", "AR100"):
            assert k in res["metrics"]
        assert np.isfinite(res["history"][-1]["total"])
