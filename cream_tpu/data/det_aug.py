"""Deterministic (seed-replayable) training augmentations.

The capability behind TinyViT's fast distillation pipeline
(TinyViT/data/augmentation/aug_random.py:1-61): every sample's augmentation
is a pure function of an int32 seed, so teacher logits saved for epoch e,
sample i stay valid when the student replays seed(e, i). The reference swaps
a global PCG64 into a vendored timm stack; here augs explicitly take a
np.random.Generator — determinism by construction, host- and
order-independent.
"""
from __future__ import annotations

import dataclasses

import numpy as np
from PIL import Image


def sample_seed(base_seed: int, epoch: int, index: int) -> int:
    """Stable per-(epoch, sample) seed (int32, SplitMix-style)."""
    x = (base_seed * 0x9E3779B1 + epoch * 0x85EBCA77 + index * 0xC2B2AE3D)
    x &= 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x7FEB352D) & 0xFFFFFFFF
    x ^= x >> 15
    return int(x & 0x7FFFFFFF)


def rrc_box(W: int, H: int, rng: np.random.Generator, scale=(0.08, 1.0),
            ratio=(3 / 4, 4 / 3)) -> tuple:
    """The (x0, y0, w, h) crop box of torchvision RandomResizedCrop (10
    tries then center fallback). Split out from random_resized_crop so the
    native C++ pipeline (data/native_pipe.py) consumes the IDENTICAL seeded
    decision sequence and differs only in resampling arithmetic."""
    area = W * H
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        w = int(round(np.sqrt(target * ar)))
        h = int(round(np.sqrt(target / ar)))
        if 0 < w <= W and 0 < h <= H:
            x0 = int(rng.integers(0, W - w + 1))
            y0 = int(rng.integers(0, H - h + 1))
            return x0, y0, w, h
    # fallback: center crop at the clamped aspect
    in_ratio = W / H
    if in_ratio < ratio[0]:
        w, h = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        w, h = int(round(H * ratio[1])), H
    else:
        w, h = W, H
    return (W - w) // 2, (H - h) // 2, w, h


def random_resized_crop(img: Image.Image, rng: np.random.Generator,
                        size: int, scale=(0.08, 1.0),
                        ratio=(3 / 4, 4 / 3)) -> Image.Image:
    """torchvision RandomResizedCrop semantics (10 tries then center
    fallback), bicubic."""
    W, H = img.size
    x0, y0, w, h = rrc_box(W, H, rng, scale, ratio)
    return img.resize((size, size), Image.BICUBIC, box=(x0, y0, x0 + w, y0 + h))


def train_transform(img: Image.Image, seed: int, size: int = 224,
                    mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                    hflip: float = 0.5) -> np.ndarray:
    """Seeded RRC + horizontal flip + normalize -> float32 HWC."""
    rng = np.random.default_rng(seed)
    img = img.convert("RGB")
    img = random_resized_crop(img, rng, size)
    if rng.random() < hflip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


@dataclasses.dataclass(frozen=True)
class TrainAugConfig:
    """The reference training recipe's aug knobs (timm create_transform args;
    TinyViT/data/build.py, AutoFormer lib/datasets.py)."""
    img_size: int = 224
    hflip: float = 0.5
    scale: tuple = (0.08, 1.0)
    ratio: tuple = (3 / 4, 4 / 3)
    color_jitter: float = 0.4             # applied only when auto_augment off
    auto_augment: str = "rand-m9-mstd0.5-inc1"
    reprob: float = 0.25                  # random erasing probability
    remode: str = "pixel"
    recount: int = 1
    mean: tuple = (0.485, 0.456, 0.406)
    std: tuple = (0.229, 0.224, 0.225)


def make_train_transform(cfg: TrainAugConfig):
    """Full deterministic training pipeline: RRC -> hflip -> RandAugment/
    AutoAugment (or color jitter) -> normalize -> random erasing; a pure
    function of (image, seed) like the reference's patched timm stack
    (timm order in transforms_factory: aa disables color jitter)."""
    from cream_tpu.data.auto_augment import (
        RandomErasing, color_jitter, create_augmenter)

    augmenter = create_augmenter(
        cfg.auto_augment,
        hparams=dict(translate_const=int(cfg.img_size * 0.45),
                     img_mean=tuple(int(round(255 * m)) for m in cfg.mean)))
    eraser = (RandomErasing(cfg.reprob, mode=cfg.remode,
                            max_count=cfg.recount)
              if cfg.reprob > 0 else None)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)

    def transform(img: Image.Image, seed: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        img = img.convert("RGB")
        img = random_resized_crop(img, rng, cfg.img_size, cfg.scale, cfg.ratio)
        if rng.random() < cfg.hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if augmenter is not None:
            img = augmenter(img, rng)
        elif cfg.color_jitter > 0:
            img = color_jitter(img, rng, cfg.color_jitter)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - mean) / std
        if eraser is not None:
            arr = eraser(arr, rng)
        return arr

    return transform
