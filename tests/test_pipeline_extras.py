"""Supernet engine, distill pipeline step, shard reader, remap, profiling."""
import io
import os
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cream_tpu.models import create_model
from cream_tpu.models.autoformer import SPACES
from cream_tpu.nas.supernet_engine import (
    make_supernet_train_step, train_supernet_epoch)
from cream_tpu.distill.pipeline import make_distill_train_step
from cream_tpu.train import TrainState
from cream_tpu.zoo.remap import remap_22k_to_1k

from helpers import jit_init


@pytest.mark.slow
class TestSupernetEngine:
    def test_random_subnet_training_single_compile(self):
        space = SPACES["tiny"]
        model = create_model("autoformer_supernet_tiny", num_classes=8,
                             drop_path_rate=0.0)
        x = jax.random.normal(jax.random.key(0), (4, 96, 96, 3))
        y = jnp.arange(4) % 8
        from cream_tpu.models.autoformer import encode_config, sample_config
        enc0 = encode_config(sample_config(np.random.default_rng(0), space),
                             space)
        v = jit_init(model, x, enc0)
        tx = optax.sgd(0.01)
        state = TrainState.create(params=v["params"], tx=tx)
        step = make_supernet_train_step(model)
        batches = [{"image": x, "label": y}] * 6
        state, losses = train_supernet_epoch(state, step, batches, space,
                                             epoch=0, log=lambda *a: None)
        assert len(losses) == 6 and losses[-1] < losses[0]
        assert step._cache_size() == 1  # one compile across sampled subnets


@pytest.mark.slow
class TestDistillStep:
    def test_distill_step_learns_teacher(self):
        model = create_model("efficientvit_m0", num_classes=8)
        x = jax.random.normal(jax.random.key(0), (8, 64, 64, 3))
        v = jit_init(model, x)
        tx = optax.adam(1e-3)
        state = TrainState.create(params=v["params"], tx=tx,
                                  batch_stats=v["batch_stats"])
        step = make_distill_train_step(model, num_classes=8)
        # teacher says class (i % 8) with prob .9
        idxs = jnp.stack([jnp.arange(8) % 8, (jnp.arange(8) + 1) % 8], -1)
        vals = jnp.tile(jnp.asarray([[0.9, 0.05]]), (8, 1))
        batch = {"image": x, "topk_values": vals, "topk_indices": idxs}
        losses = []
        for _ in range(8):
            state, m = step(state, batch, jax.random.key(1))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]


class TestShardReader:
    def test_tar_pairs_and_loader(self, tmp_path):
        from PIL import Image
        from cream_tpu.data.shards import ShardListDataset, image_text_loader

        shard = tmp_path / "shard-000.tar"
        with tarfile.open(shard, "w") as tf:
            for i in range(6):
                img = Image.fromarray(
                    np.full((32, 32, 3), i * 30, np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"sample{i}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                txt = f"caption number {i}".encode()
                info = tarfile.TarInfo(f"sample{i}.txt")
                info.size = len(txt)
                tf.addfile(info, io.BytesIO(txt))

        ds = ShardListDataset([str(shard)])

        def fake_tok(texts, context_length):
            return np.zeros((len(texts), context_length), np.int32)

        batches = list(image_text_loader(ds, fake_tok, epoch=0, batch_size=3,
                                         img_size=32, num_workers=2))
        assert len(batches) == 2
        assert batches[0]["image"].shape == (3, 32, 32, 3)
        assert batches[0]["text"].shape == (3, 77)


class TestRemap:
    def test_remap_gathers_and_masks(self):
        mapping = np.full(1000, -1, np.int32)
        mapping[0], mapping[1] = 5, 7
        logits = jnp.arange(2 * 21841, dtype=jnp.float32).reshape(2, 21841)
        out = remap_22k_to_1k(logits, mapping)
        assert out.shape == (2, 1000)
        assert float(out[0, 0]) == 5.0 and float(out[0, 1]) == 7.0
        assert np.isneginf(np.asarray(out[0, 2]))


class TestProfiling:
    def test_step_timer(self):
        from cream_tpu.core.profiling import StepTimer
        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                pass
        assert len(t.times) == 2 and t.mean >= 0


class TestIN22KDataset:
    def test_layout_and_loading(self, tmp_path):
        import zipfile
        from PIL import Image as PILImage
        from cream_tpu.data.imagenet import IN22KDataset
        names = []
        for cls, n_img in (("n00000001", 2), ("n00000002", 1)):
            with zipfile.ZipFile(tmp_path / f"{cls}.zip", "w") as zf:
                for i in range(n_img):
                    iname = f"{cls}_{i}"
                    names.append(iname)
                    import io
                    buf = io.BytesIO()
                    PILImage.new("RGB", (8, 8), (i * 40, 0, 0)).save(
                        buf, "JPEG")
                    zf.writestr(f"{iname}.jpeg", buf.getvalue())
        (tmp_path / "in22k_image_names.txt").write_text(
            "\n".join(reversed(names)) + "\n")      # order must not matter
        ds = IN22KDataset(str(tmp_path))
        assert ds.nb_classes == 2 and len(ds) == 3
        img, label = ds.load(0)
        assert label == 0 and img.size == (8, 8)
        _, l2 = ds.load(2)
        assert l2 == 1
        assert ds.get_keys()[0].startswith("n00000001_")


class TestScalarLogger:
    def test_jsonl_backend_and_wandb_fallback(self, tmp_path):
        import json
        from cream_tpu.train.metrics import ScalarLogger
        with pytest.warns(UserWarning, match="wandb not installed"):
            lg = ScalarLogger(logdir=str(tmp_path),
                              wandb_project="missing-package")
        lg.log(1, loss=0.5, acc=10.0)
        lg.log(2, loss=0.25)
        lg.close()
        lines = [json.loads(l) for l in
                 (tmp_path / "wandb_fallback.jsonl").read_text().splitlines()]
        assert lines[0] == {"step": 1, "loss": 0.5, "acc": 10.0}
        assert lines[1]["loss"] == 0.25


class TestZeroShotConstants:
    def test_full_openai_set(self):
        from cream_tpu.train.zero_shot import openai_imagenet_constants
        names, templates = openai_imagenet_constants()
        assert len(names) == 1000 and len(templates) == 80
        assert names[0] == "tench" and names[-1] == "toilet paper"
        assert "a photo of a {}." in templates
        assert all("{}" in t for t in templates)
