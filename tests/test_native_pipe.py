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

    def test_host_sharded_loaders_partition(self, tmp_path):
        """shard=(i, k) slices are disjoint and their union is the full
        epoch — the DistributedSampler contract; per-sample aug seeds are
        host-count-invariant."""
        from cream_tpu.core.mesh import process_shard
        from cream_tpu.data.imagenet import eval_loader, train_loader

        np.testing.assert_array_equal(
            np.sort(np.concatenate([process_shard(10, 0, 3),
                                    process_shard(10, 1, 3),
                                    process_shard(10, 2, 3)])), np.arange(10))

        ds = self._folder(tmp_path)
        full = [i for b in eval_loader(ds, 2, pad_final=False)
                for i in b["index"]]
        # sharded eval always pads (hosts must emit equal batch counts);
        # label=-1/index=-1 rows are what the eval step masks out
        parts = [i for s in (0, 1)
                 for b in eval_loader(ds, 2, shard=(s, 2))
                 for i in b["index"] if i >= 0]
        assert sorted(parts) == sorted(full)
        steps = [sum(1 for _ in eval_loader(ds, 2, shard=(s, 2)))
                 for s in (0, 1)]
        assert steps[0] == steps[1]  # equal step count regardless of remainder

        ref = {}
        for b in train_loader(ds, 1, epoch=3, drop_last=False):
            ref[int(b["index"][0])] = int(b["seed"][0])
        got = {}
        for s in (0, 1):
            shard_seen = {}
            for b in train_loader(ds, 1, epoch=3, drop_last=False,
                                  shard=(s, 2)):
                shard_seen[int(b["index"][0])] = int(b["seed"][0])
            assert len(shard_seen) == len(ds) // 2  # equal per-host length
            assert not (set(shard_seen) & set(got))  # disjoint across hosts
            got.update(shard_seen)
        # every kept sample keeps its host-count-independent aug seed
        assert all(ref[i] == s for i, s in got.items())
        assert len(got) == (len(ds) // 2) * 2

    def test_image_text_loader_native(self, tmp_path):
        """CLIP shard reader: native decode == PIL path (JPEG members),
        per-pair PIL fallback for PNG members."""
        import tarfile

        from cream_tpu.data.shards import ShardListDataset, image_text_loader

        p = tmp_path / "shard_000.tar"
        with tarfile.open(p, "w") as tf:
            for j in range(4):
                key = f"k{j}"
                if j == 2:  # one PNG member exercises the fallback
                    png = io.BytesIO()
                    Image.fromarray(np.full((60, 70, 3), 90, np.uint8)
                                    ).save(png, "PNG")
                    payloadi = png.getvalue()
                else:
                    payloadi = _jpeg(260, 200, 40 + j)
                for ext, payload in (("jpg", payloadi),
                                     (("txt"), f"caption {key}".encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))

        def tok(texts, L):
            return np.zeros((len(texts), L), np.int32)

        ds = ShardListDataset([str(p)], seed=0)
        ref = list(image_text_loader(ds, tok, epoch=0, batch_size=2,
                                     img_size=64))
        got = list(image_text_loader(ds, tok, epoch=0, batch_size=2,
                                     img_size=64, native="auto"))
        assert len(ref) == len(got) == 2
        for rb, gb in zip(ref, got):
            assert np.abs(rb["image"] - gb["image"]).mean() < MEAN_TOL

    def test_native_true_without_lib_raises(self, tmp_path, monkeypatch):
        from cream_tpu.data import native_pipe
        from cream_tpu.data.imagenet import eval_loader
        ds = self._folder(tmp_path)
        monkeypatch.setattr(native_pipe, "available", lambda: False)
        with pytest.raises(RuntimeError):
            next(eval_loader(ds, 4, native=True))
