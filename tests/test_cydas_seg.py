"""CyDAS segmentation downstream: resize-op, OHEM-loss, and full-model
parity against the live reference (CDARTS/CDARTS_segmentation/train/cydas.py
CyDASseg, tools/seg_opr/loss_opr.py ProbOhemCrossEntropy2d)."""
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.ops.resize import bilinear_resize
from cream_tpu.train.segmentation import (batch_intersection_union,
                                          cydas_seg_loss, miou_from_hist,
                                          ohem_cross_entropy, seg_confusion)

from torch_ref import REFERENCE, load_cydas_seg_module, state_dict_numpy

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_bilinear_resize_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 21, 5)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for out_hw in [(26, 42), (7, 10), (13, 21), (20, 33), (1, 1)]:
        for ac in (False, True):
            want = F.interpolate(xt, size=out_hw, mode="bilinear",
                                 align_corners=ac)
            got = bilinear_resize(jnp.asarray(x), out_hw, align_corners=ac)
            np.testing.assert_allclose(
                np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
                atol=1e-5, err_msg=f"out={out_hw} align_corners={ac}")


def _load_ref_ohem():
    if "engine.logger" not in sys.modules:
        pkg = types.ModuleType("engine")
        pkg.__path__ = []
        lg = types.ModuleType("engine.logger")
        import logging
        lg.get_logger = lambda *a, **k: logging.getLogger("ref_seg")
        pkg.logger = lg
        sys.modules["engine"] = pkg
        sys.modules["engine.logger"] = lg
    spec = importlib.util.spec_from_file_location(
        "ref_loss_opr",
        f"{REFERENCE}/CDARTS/CDARTS_segmentation/tools/seg_opr/loss_opr.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_loss_opr"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("min_kept", [1, 64, 5000, 100000])
def test_ohem_matches_reference(min_kept):
    """Reference ProbOhemCrossEntropy2d semantics: keep the valid pixels
    with target-prob <= max(thresh, min_kept-th smallest), mean CE over the
    kept set; min_kept > num_valid degrades to plain ignore-masked CE."""
    mod = _load_ref_ohem()
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 19, 17, 23)).astype(np.float32) * 3
    labels = rng.integers(0, 19, size=(2, 17, 23)).astype(np.int64)
    labels[rng.random(labels.shape) < 0.3] = 255

    crit = mod.ProbOhemCrossEntropy2d(ignore_label=255, thresh=0.7,
                                      min_kept=min_kept)
    want = crit(torch.from_numpy(logits), torch.from_numpy(labels)).item()

    got = ohem_cross_entropy(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(labels.astype(np.int32)), thresh=0.7, min_kept=min_kept)
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


def test_miou_matches_numpy_hist():
    """seg_confusion/miou vs the reference compute_hist numpy recipe
    (tools/utils/pyt_utils.py): hist[t, p] bincount over valid pixels."""
    rng = np.random.default_rng(2)
    pred = rng.integers(0, 7, size=(3, 11, 13))
    lab = rng.integers(0, 7, size=(3, 11, 13))
    lab[rng.random(lab.shape) < 0.2] = 255
    valid = lab != 255
    want_hist = np.bincount(
        7 * lab[valid].astype(int) + pred[valid], minlength=49).reshape(7, 7)
    hist = seg_confusion(jnp.asarray(pred), jnp.asarray(lab), 7)
    np.testing.assert_array_equal(np.asarray(hist), want_hist)
    inter, union = batch_intersection_union(jnp.asarray(pred),
                                            jnp.asarray(lab), 7)
    np.testing.assert_array_equal(np.asarray(inter), np.diag(want_hist))
    iu = want_hist.sum(0) + want_hist.sum(1) - np.diag(want_hist)
    np.testing.assert_array_equal(np.asarray(union), iu)
    miou, per_class = miou_from_hist(hist)
    want_iou = np.diag(want_hist) / np.maximum(iu, 1e-12)
    np.testing.assert_allclose(np.asarray(per_class)[iu > 0],
                               want_iou[iu > 0], rtol=1e-6)
    np.testing.assert_allclose(float(miou), want_iou[iu > 0].mean()
                               if (iu > 0).any() else 0.0, rtol=1e-6)


class TestCyDASSegParity:
    @classmethod
    def setup_class(cls):
        mod = load_cydas_seg_module()
        t = mod.CyDASseg(Fch=12, num_classes=19)
        t.eval()
        cls.tnet = t
        sd = state_dict_numpy(t)
        from cream_tpu.models.cydas_seg import cydas_seg
        from cream_tpu.zoo.import_torch import convert_cydas_seg
        cls.model = cydas_seg(num_classes=19)
        cls.variables = convert_cydas_seg(sd)
        rng = np.random.default_rng(3)
        cls.x = rng.standard_normal((2, 64, 96, 3)).astype(np.float32)

    def test_converted_tree_matches_init(self):
        init = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 96, 3)), train=True))
        for col in ("params", "batch_stats"):
            want = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_leaves_with_path(init[col])}
            got = {jax.tree_util.keystr(k): np.shape(v) for k, v in
                   jax.tree_util.tree_leaves_with_path(self.variables[col])}
            assert want == got, (
                f"{col}: missing={sorted(set(want) - set(got))[:5]} "
                f"extra={sorted(set(got) - set(want))[:5]}")

    def test_eval_forward_parity(self):
        with torch.no_grad():
            want = self.tnet(torch.from_numpy(self.x.transpose(0, 3, 1, 2)))
        got = jax.jit(lambda v, x: self.model.apply(v, x))(
            self.variables, jnp.asarray(self.x))
        np.testing.assert_allclose(np.asarray(got),
                                   want.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4, rtol=1e-4)

    def test_aux_head_parity(self):
        # Flip only the top module's training flag: forward takes the
        # deep-supervision branch while children (BN, DropPath) stay in
        # eval mode, matching flax train=False aux=True.
        self.tnet.training = True
        try:
            with torch.no_grad():
                w8, w16, w32 = self.tnet(
                    torch.from_numpy(self.x.transpose(0, 3, 1, 2)))
        finally:
            self.tnet.training = False
        g8, g16, g32 = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False, aux=True))(
                self.variables, jnp.asarray(self.x))
        for got, want in [(g8, w8), (g16, w16), (g32, w32)]:
            np.testing.assert_allclose(np.asarray(got),
                                       want.numpy().transpose(0, 2, 3, 1),
                                       atol=2e-4, rtol=1e-4)

    def test_train_loss_runs(self):
        labels = jnp.zeros((2, 64, 96), jnp.int32)
        preds = self.model.apply(self.variables, jnp.asarray(self.x),
                                 train=False, aux=True)
        loss, parts = cydas_seg_loss(preds, labels, min_kept=512)
        assert np.isfinite(float(loss))
        assert float(loss) == pytest.approx(
            float(parts["loss8"] + 0.2 * (parts["loss16"]
                                          + parts["loss32"])), rel=1e-6)


class TestEndToEnd:
    def _write_dataset(self, root, n=6, hw=(72, 96), ncls=7):
        from PIL import Image
        img_dir = root / "img"
        lab_dir = root / "lab"
        img_dir.mkdir()
        lab_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(n):
            img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
            lab = np.repeat(np.repeat(
                rng.integers(0, ncls, (hw[0] // 8, hw[1] // 8)), 8, 0), 8, 1)
            lab = lab.astype(np.uint8)
            lab[:4] = 255
            Image.fromarray(img).save(img_dir / f"s{i}.png")
            Image.fromarray(lab).save(lab_dir / f"s{i}.png")
        return str(img_dir), str(lab_dir)

    def test_train_and_eval_on_folder(self, tmp_path):
        from cream_tpu.cli.train_seg import main
        img_dir, lab_dir = self._write_dataset(tmp_path)
        out = str(tmp_path / "seg.json")
        res = main(["--cpu", "--steps", "2", "--epochs", "1",
                    "--batch-size", "2", "--crop", "64",
                    "--num-classes", "7", "--warmup-iters", "0",
                    "--img-dir", img_dir, "--lab-dir", lab_dir,
                    "--eval-img-dir", img_dir, "--eval-lab-dir", lab_dir,
                    "--out", out])
        assert np.isfinite(res["history"][-1]["loss"])
        assert "metrics" in res and 0.0 <= res["metrics"]["miou"] <= 1.0


def test_seg_train_batches_deterministic(tmp_path):
    """Per-sample-seed aug: the same (seed, epoch) replays bit-exactly."""
    from cream_tpu.data.segmentation import SegFolder, seg_train_batches
    t = TestEndToEnd()
    img_dir, lab_dir = t._write_dataset(tmp_path)
    ds = SegFolder(img_dir, lab_dir)
    a = list(seg_train_batches(ds, 2, (48, 48), seed=3, epoch=1))
    b = list(seg_train_batches(ds, 2, (48, 48), seed=3, epoch=1))
    c = list(seg_train_batches(ds, 2, (48, 48), seed=3, epoch=2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
        np.testing.assert_array_equal(x["label"], y["label"])
    assert any(not np.array_equal(x["label"], y["label"])
               for x, y in zip(a, c))
