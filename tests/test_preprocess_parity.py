"""Eval-preprocessing parity (SURVEY.md §8.1, VERDICT round-1 weak #9).

torchvision is not installed in this image, so the oracle is torchvision's
own size math, re-implemented inline from its public source and pinned with
hand-computed expected values:

  * F.resize (PIL path, int size):   short side = size,
    long side = int(size * long / short)          -- TRUNCATION, not round
    (torchvision/transforms/functional_pil.py::resize)
  * F.center_crop: crop_top = int(round((h - ch) / 2.0)) -- Python banker's
    rounding (torchvision/transforms/functional.py::center_crop)

Reference eval pipelines pinned here:
  * TinyViT/data/build.py:193-205  Resize(int(256/224*img), bicubic) +
    CenterCrop(img), ImageNet mean/std
  * iRPE/DeiT-with-iRPE/datasets.py:100-109 same sizes, interpolation=3
  * TinyCLIP/src/open_clip/transform.py:103-117 Resize(img) + CenterCrop,
    OpenAI CLIP mean/std
"""
import numpy as np
import pytest
from PIL import Image

from cream_tpu.data.transforms import (CLIP_MEAN, CLIP_STD, IMAGENET_MEAN,
                                       IMAGENET_STD, crop_offsets,
                                       eval_preprocess_config, normalize,
                                       preprocess_pil, resize_size)


def tv_resize_size(w, h, size):
    """torchvision functional_pil.resize size math, verbatim semantics."""
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = size, int(size * long / short)
    return (new_short, new_long) if w <= h else (new_long, new_short)


def tv_crop_offsets(nw, nh, crop):
    """torchvision functional.center_crop offset math."""
    return int(round((nw - crop) / 2.0)), int(round((nh - crop) / 2.0))


# (w, h, shorter) -> hand-computed torchvision (new_w, new_h)
RESIZE_CASES = [
    ((300, 400, 256), (256, 341)),   # 256*400/300 = 341.33 -> 341
    ((640, 480, 256), (341, 256)),
    ((500, 333, 256), (384, 256)),   # 256*500/333 = 384.38 -> 384
    ((225, 316, 224), (224, 314)),   # 224*316/225 = 314.595: int!=round
    ((224, 224, 256), (256, 256)),
    ((256, 224, 438), (500, 438)),   # TinyViT-384 shorter side 438
]

# (new_w, new_h, crop) -> (left, top); includes .5 banker's-rounding cases
CROP_CASES = [
    ((341, 256, 224), (58, 16)),     # (341-224)/2 = 58.5 -> 58 (to even)
    ((343, 256, 224), (60, 16)),     # (343-224)/2 = 59.5 -> 60 (to even)
    ((256, 341, 224), (16, 58)),
    ((224, 224, 224), (0, 0)),
]


@pytest.mark.parametrize("inp,expected", RESIZE_CASES)
def test_resize_size_matches_torchvision(inp, expected):
    w, h, s = inp
    assert resize_size(w, h, s) == expected
    assert tv_resize_size(w, h, s) == expected


@pytest.mark.parametrize("inp,expected", CROP_CASES)
def test_crop_offsets_match_torchvision(inp, expected):
    nw, nh, c = inp
    assert crop_offsets(nw, nh, c) == expected
    assert tv_crop_offsets(nw, nh, c) == expected


def test_exhaustive_size_math_agreement():
    rng = np.random.default_rng(0)
    for _ in range(500):
        w, h = rng.integers(50, 1200, 2)
        s = int(rng.integers(32, 600))
        assert resize_size(w, h, s) == tv_resize_size(w, h, s)
        nw, nh = resize_size(w, h, s)
        c = min(nw, nh)
        assert crop_offsets(nw, nh, c) == tv_crop_offsets(nw, nh, c)


def _rand_pil(rng, w, h):
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8), "RGB")


@pytest.mark.parametrize("wh", [(300, 400), (343 * 2, 256 * 2), (640, 480),
                                (225, 316)])
def test_pixel_parity_vs_straightline_oracle(wh):
    """preprocess_pil == an independently-coded torchvision-semantics
    pipeline, bit-exact (both use PIL bicubic like torchvision's PIL path)."""
    rng = np.random.default_rng(42)
    img = _rand_pil(rng, *wh)
    cfg = eval_preprocess_config(224)
    got = preprocess_pil(img, cfg)

    nw, nh = tv_resize_size(*wh, cfg.resize_shorter)
    ref = img.resize((nw, nh), Image.BICUBIC)
    left, top = tv_crop_offsets(nw, nh, 224)
    ref = ref.crop((left, top, left + 224, top + 224))
    ref = np.asarray(ref, np.float32) / 255.0
    ref = (ref - np.asarray(IMAGENET_MEAN, np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    np.testing.assert_array_equal(got, ref)
    assert got.shape == (224, 224, 3)


def test_clip_lineage_config():
    """TinyCLIP eval: Resize(img) + CenterCrop(img) (val_keep_ratio=True),
    OpenAI constants (open_clip/transform.py:27-28,103-110)."""
    cfg = eval_preprocess_config(224, crop=False, clip=True)
    assert cfg.resize_shorter == 224 and cfg.crop == 224
    assert np.allclose(cfg.mean, (0.48145466, 0.4578275, 0.40821073))
    assert np.allclose(cfg.std, (0.26862954, 0.26130258, 0.27577711))
    rng = np.random.default_rng(1)
    img = _rand_pil(rng, 320, 240)
    out = preprocess_pil(img, cfg)
    assert out.shape == (224, 224, 3)


def test_deit_lineage_sizes():
    """iRPE/DeiT eval: int((256/224)*input) shorter side (datasets.py:103)."""
    for img_size in (224, 384):
        cfg = eval_preprocess_config(img_size)
        assert cfg.resize_shorter == int(256 / 224 * img_size)
        assert cfg.crop == img_size
    assert eval_preprocess_config(384).resize_shorter == 438


def test_normalize_constants_and_math():
    assert IMAGENET_MEAN == (0.485, 0.456, 0.406)
    assert IMAGENET_STD == (0.229, 0.224, 0.225)
    assert CLIP_MEAN == (0.48145466, 0.4578275, 0.40821073)
    assert CLIP_STD == (0.26862954, 0.26130258, 0.27577711)
    x = np.full((2, 2, 3), 0.5, np.float32)
    y = normalize(x, eval_preprocess_config(224))
    expect = (0.5 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(y[0, 0], expect.astype(np.float32), rtol=1e-6)
