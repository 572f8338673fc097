"""Mid-epoch resume: resumable shard stream + kill/resume pipeline parity.

The reference resumes inside an epoch via saved iter_in_epoch
(TinyCLIP/src/training/main.py:400) over the resumable detshuffle2 stream
(data.py:35). Here: (a) the shard iterator fast-forwarded to sample N
reproduces the unbroken stream's tail exactly; (b) a killed-and-resumed
pipeline stage reproduces the uninterrupted run bit-for-bit.
"""
import io
import os
import tarfile

import numpy as np
import pytest

from cream_tpu.data.shards import ShardListDataset, image_text_loader


def _make_shards(tmp_path, n_shards=3, per_shard=5):
    paths = []
    for s in range(n_shards):
        p = tmp_path / f"shard_{s:03d}.tar"
        with tarfile.open(p, "w") as tf:
            for j in range(per_shard):
                key = f"s{s}_{j}"
                img = np.random.RandomState(s * 100 + j).randint(
                    0, 255, (8, 8, 3), np.uint8)
                from PIL import Image
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                for ext, payload in (("png", buf.getvalue()),
                                     ("txt", f"caption {key}".encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))
        paths.append(str(p))
    return paths


class TestResumableShards:
    def test_start_sample_resumes_stream(self, tmp_path):
        ds = ShardListDataset(_make_shards(tmp_path), seed=3)
        full = [k for k, _, _ in ds.epoch_iter(epoch=2)]
        assert len(full) == 15
        for cut in (0, 4, 7, 14):
            tail = [k for k, _, _ in ds.epoch_iter(epoch=2, start_sample=cut)]
            assert tail == full[cut:]

    def test_loader_start_batch(self, tmp_path):
        ds = ShardListDataset(_make_shards(tmp_path), seed=0)

        def tok(texts, ctx):
            return np.zeros((len(texts), ctx), np.int32)

        full = list(image_text_loader(ds, tok, epoch=1, batch_size=3,
                                      img_size=8, context_length=4))
        resumed = list(image_text_loader(ds, tok, epoch=1, batch_size=3,
                                         img_size=8, context_length=4,
                                         start_batch=2))
        assert len(resumed) == len(full) - 2
        for a, b in zip(full[2:], resumed):
            np.testing.assert_array_equal(a["image"], b["image"])


class TestKillResumePipeline:
    def test_killed_stage_resumes_bit_exact(self, tmp_path):
        from cream_tpu.cli.tinyclip_pipeline import main

        common = ["--cpu", "--synthetic", "--sparsities", "0.25",
                  "--steps", "8", "--batch-size", "4", "--image-size", "32",
                  "--vision-width", "64", "--vision-layers", "1",
                  "--text-width", "64", "--text-layers", "1",
                  "--context", "8", "--l0-lr", "0.5",
                  "--l0-init-mean", "2.0"]
        out_a = str(tmp_path / "uninterrupted")
        main(common + ["--out", out_a])

        out_b = str(tmp_path / "resumed")
        # killed after 4 steps (mid-stage checkpoint every 2)...
        r = main(common + ["--out", out_b, "--save-every", "2",
                           "--stop-after", "4"])
        assert r is None
        assert os.path.exists(os.path.join(out_b, "mid_stage_0.npz"))
        # ...then restarted: auto-resumes at step 4 and finishes
        main(common + ["--out", out_b, "--save-every", "2"])
        assert not os.path.exists(os.path.join(out_b, "mid_stage_0.npz"))

        import json
        ra = json.load(open(os.path.join(out_a, "report.json")))
        rb = json.load(open(os.path.join(out_b, "report.json")))
        assert ra[-1]["final_pair_similarity"] == \
            rb[-1]["final_pair_similarity"]
        assert [r.get("params") for r in ra] == [r.get("params") for r in rb]
