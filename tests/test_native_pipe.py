"""Native C++ image pipeline (native/image_pipe.cc) vs the PIL reference
path.

Contract: identical seeded *decisions* (RRC boxes, flip coins, eval size
math), resampling within tolerance of Pillow's algorithm (fp32 vs Pillow's
fixed-point intermediate; ~1/255 per channel). Decode failures fall back to
PIL per-image inside the loaders.
"""
import io
import os

import numpy as np
import pytest
from PIL import Image

from cream_tpu.data import native_pipe as npp
from cream_tpu.data.det_aug import train_transform
from cream_tpu.data.transforms import eval_preprocess_config, preprocess_pil

pytestmark = pytest.mark.skipif(
    not npp.available(), reason="native/libimage_pipe.so not built")

# normalized-unit tolerances: 1/255 in pixel units is ~0.0174 after /std
MEAN_TOL = 0.012   # ~0.7 of a pixel level on average
MAX_TOL = 0.40     # isolated pixels on sharp edges


def _jpeg(w, h, seed=0, q=92):
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (max(2, h // 12), max(2, w // 12), 3),
                         dtype=np.uint8)
    arr = np.asarray(Image.fromarray(small).resize((w, h), Image.BICUBIC))
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=q)
    return buf.getvalue()


class TestNativePipe:
    def test_probe_sizes(self):
        bufs = [_jpeg(320, 200), b"not a jpeg", _jpeg(64, 48)]
        wh = npp.probe_sizes(bufs)
        assert wh.tolist() == [[320, 200], [0, 0], [64, 48]]

    def test_eval_parity(self):
        cfg = eval_preprocess_config(224)
        bufs = [_jpeg(500, 375, 1), _jpeg(640, 480, 2), _jpeg(224, 224, 3),
                _jpeg(150, 300, 4)]
        wh = npp.probe_sizes(bufs)
        imgs, status = npp.decode_batch(
            bufs, npp.eval_params(wh, cfg), 224, cfg.mean, cfg.std,
            allow_prescale=False)
        assert (status == 0).all()
        for i, b in enumerate(bufs):
            ref = preprocess_pil(Image.open(io.BytesIO(b)), cfg)
            d = np.abs(imgs[i] - ref)
            assert d.mean() < MEAN_TOL and d.max() < MAX_TOL, (i, d.mean(),
                                                               d.max())

    def test_train_parity_and_decisions(self):
        bufs = [_jpeg(500, 375, 5), _jpeg(260, 240, 6)]
        wh = npp.probe_sizes(bufs)
        seeds = [123, 456]
        imgs, status = npp.decode_batch(
            bufs, npp.train_params(wh, seeds, 224),
            224, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
        assert (status == 0).all()
        for i, b in enumerate(bufs):
            ref = train_transform(Image.open(io.BytesIO(b)), seeds[i], 224)
            d = np.abs(imgs[i] - ref)
            # same box + flip decision => close pixels; a mismatch in either
            # would give O(1) differences everywhere
            assert d.mean() < MEAN_TOL and d.max() < MAX_TOL, (i, d.mean(),
                                                               d.max())

    def test_prescale_stays_close(self):
        # DCT-domain reduced decode: looser but bounded divergence
        cfg = eval_preprocess_config(224)
        bufs = [_jpeg(1024, 768, 7)]
        wh = npp.probe_sizes(bufs)
        imgs, status = npp.decode_batch(
            bufs, npp.eval_params(wh, cfg), 224, cfg.mean, cfg.std,
            allow_prescale=True)
        assert (status == 0).all()
        ref = preprocess_pil(Image.open(io.BytesIO(bufs[0])), cfg)
        assert np.abs(imgs[0] - ref).mean() < 0.05

    def test_decode_failure_status(self):
        cfg = eval_preprocess_config(224)
        params = np.asarray([[0, 0, -1, -1, 256, 256, 16, 16, 0]], np.int32)
        imgs, status = npp.decode_batch([b"garbage"], params, 224,
                                        cfg.mean, cfg.std)
        assert status[0] != 0
        assert (imgs[0] == 0).all()


class TestLoaderIntegration:
    def _folder(self, tmp_path):
        for cls, seed in (("a", 10), ("b", 11)):
            d = tmp_path / cls
            d.mkdir()
            for k in range(2):
                (d / f"img{k}.jpg").write_bytes(_jpeg(300, 250, seed + k))
        # a PNG member exercises the per-image PIL fallback
        png = io.BytesIO()
        Image.fromarray(np.full((100, 120, 3), 77, np.uint8)).save(png, "PNG")
        (tmp_path / "a" / "img9.png").write_bytes(png.getvalue())
        from cream_tpu.data.imagenet import ImageFolder
        return ImageFolder(str(tmp_path))

    def test_eval_loader_native_matches(self, tmp_path):
        from cream_tpu.data.imagenet import eval_loader
        ds = self._folder(tmp_path)
        ref = list(eval_loader(ds, 4, num_workers=2))
        got = list(eval_loader(ds, 4, num_workers=2, native="auto"))
        assert len(ref) == len(got)
        for rb, gb in zip(ref, got):
            np.testing.assert_array_equal(rb["label"], gb["label"])
            np.testing.assert_array_equal(rb["index"], gb["index"])
            assert np.abs(rb["image"] - gb["image"]).mean() < MEAN_TOL

    def test_train_loader_native_matches(self, tmp_path):
        from cream_tpu.data.imagenet import train_loader
        ds = self._folder(tmp_path)
        ref = list(train_loader(ds, 4, epoch=1, num_workers=2))
        got = list(train_loader(ds, 4, epoch=1, num_workers=2, native="auto"))
        assert len(ref) == len(got) > 0
        for rb, gb in zip(ref, got):
            np.testing.assert_array_equal(rb["label"], gb["label"])
            np.testing.assert_array_equal(rb["seed"], gb["seed"])
            assert np.abs(rb["image"] - gb["image"]).mean() < MEAN_TOL

    def test_prefetch_preserves_order_and_errors(self):
        from cream_tpu.data.imagenet import prefetch

        assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

        def boom():
            yield 1
            raise ValueError("loader failure")

        it = prefetch(boom(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError):
            next(it)

    def test_native_true_without_lib_raises(self, tmp_path, monkeypatch):
        from cream_tpu.data import native_pipe
        from cream_tpu.data.imagenet import eval_loader
        ds = self._folder(tmp_path)
        monkeypatch.setattr(native_pipe, "available", lambda: False)
        with pytest.raises(RuntimeError):
            next(eval_loader(ds, 4, native=True))
