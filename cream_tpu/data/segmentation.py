"""Cityscapes-style semantic-segmentation data pipeline.

Rebuild of CDARTS/CDARTS_segmentation/train/dataloader.py TrainPre (random
mirror -> random scale -> normalize -> random crop padded to shape, image
pad 0 / label pad 255 — tools/utils/img_utils.py) over a paired-directory
dataset (images + same-stem label PNGs). Deterministic by construction:
every sample's augmentation draws from a Generator seeded with
(seed, epoch, index) — the framework's per-sample-seed convention
(data/auto_augment.py), not torch's global-RNG workers.
"""
from __future__ import annotations

import os

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
DEFAULT_SCALES = (0.75, 1.0, 1.25, 1.5, 1.75, 2.0)


class SegFolder:
    """Pairs `img_dir/x.{png,jpg}` with `lab_dir/x.png` by stem; labels are
    class-index PNGs with 255 = ignore (the Cityscapes trainId encoding the
    reference trains on)."""

    def __init__(self, img_dir: str, lab_dir: str):
        exts = (".png", ".jpg", ".jpeg")
        labs = {os.path.splitext(f)[0]: os.path.join(lab_dir, f)
                for f in os.listdir(lab_dir) if f.lower().endswith(".png")}
        self.items = []
        for f in sorted(os.listdir(img_dir)):
            stem, ext = os.path.splitext(f)
            if ext.lower() in exts and stem in labs:
                self.items.append((os.path.join(img_dir, f), labs[stem]))
        if not self.items:
            raise ValueError(f"no paired images under {img_dir} / {lab_dir}")

    def __len__(self):
        return len(self.items)

    def load(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        from PIL import Image
        img_p, lab_p = self.items[i]
        img = np.asarray(Image.open(img_p).convert("RGB"), np.uint8)
        lab = np.asarray(Image.open(lab_p), np.uint8)
        if lab.ndim == 3:
            lab = lab[..., 0]
        return img, lab.astype(np.int32)


def _resize_pair(img: np.ndarray, lab: np.ndarray, scale: float):
    from PIL import Image
    h, w = lab.shape
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    if (nh, nw) == (h, w):
        return img, lab
    im = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    lb = Image.fromarray(lab.astype(np.uint8)).resize((nw, nh), Image.NEAREST)
    return np.asarray(im, np.uint8), np.asarray(lb, np.int32)


def _crop_pad(img, lab, crop_hw, rng):
    """img_utils.random_crop_pad_to_shape: pad-to-size (img 0, label 255)
    centred on a uniformly drawn crop position."""
    ch, cw = crop_hw
    h, w = lab.shape
    top = int(rng.integers(0, max(h - ch, 0) + 1))
    left = int(rng.integers(0, max(w - cw, 0) + 1))
    img = img[top:top + ch, left:left + cw]
    lab = lab[top:top + ch, left:left + cw]
    ph, pw = ch - lab.shape[0], cw - lab.shape[1]
    if ph or pw:
        t, l = ph // 2, pw // 2
        img = np.pad(img, ((t, ph - t), (l, pw - l), (0, 0)))
        lab = np.pad(lab, ((t, ph - t), (l, pw - l)), constant_values=255)
    return img, lab


def _normalize(img: np.ndarray) -> np.ndarray:
    return (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def seg_train_batches(ds: SegFolder, batch_size: int, crop_hw: tuple,
                      scales: tuple = DEFAULT_SCALES, seed: int = 0,
                      epoch: int = 0, drop_last: bool = True):
    """Yield {image (B,H,W,3) f32, label (B,H,W) i32} shuffled batches."""
    order = np.random.default_rng((seed, epoch)).permutation(len(ds))
    n = len(order) // batch_size if drop_last else \
        -(-len(order) // batch_size)
    for b in range(n):
        idx = order[b * batch_size:(b + 1) * batch_size]
        imgs, labs = [], []
        for i in idx:
            rng = np.random.default_rng((seed, epoch, int(i)))
            img, lab = ds.load(int(i))
            if rng.random() < 0.5:  # random_mirror
                img, lab = img[:, ::-1], lab[:, ::-1]
            img, lab = _resize_pair(img, lab,
                                    float(rng.choice(np.asarray(scales))))
            img, lab = _crop_pad(img, lab, crop_hw, rng)
            imgs.append(_normalize(img))
            labs.append(lab)
        yield {"image": np.stack(imgs), "label": np.stack(labs)}


def seg_eval_batches(ds: SegFolder, batch_size: int, canvas_hw: tuple):
    """Static-shape eval: scale the long side to fit the canvas (aspect
    kept), pad img 0 / label 255. Padded pixels are ignore-class so they
    never touch the confusion matrix."""
    for b in range(-(-len(ds) // batch_size)):
        idx = range(b * batch_size, min((b + 1) * batch_size, len(ds)))
        imgs, labs = [], []
        for i in idx:
            img, lab = ds.load(int(i))
            h, w = lab.shape
            s = min(canvas_hw[0] / h, canvas_hw[1] / w)
            if s < 1.0:
                img, lab = _resize_pair(img, lab, s)
            h, w = lab.shape
            img = np.pad(_normalize(img),
                         ((0, canvas_hw[0] - h), (0, canvas_hw[1] - w),
                          (0, 0)))
            lab = np.pad(lab, ((0, canvas_hw[0] - h), (0, canvas_hw[1] - w)),
                         constant_values=255)
            imgs.append(img)
            labs.append(lab)
        while len(imgs) < batch_size:  # pad the tail batch, all-ignore
            imgs.append(np.zeros_like(imgs[0]))
            labs.append(np.full_like(labs[0], 255))
        yield {"image": np.stack(imgs), "label": np.stack(labs)}


def synthetic_seg_batches(batch_size: int, hw: tuple, num_classes: int,
                          n: int, seed: int = 0):
    """Smoke-mode batches: blocky random label maps + noise images."""
    rng = np.random.default_rng(seed)
    for _ in range(n):
        img = rng.standard_normal((batch_size, *hw, 3)).astype(np.float32)
        coarse = rng.integers(0, num_classes,
                              (batch_size, hw[0] // 8, hw[1] // 8))
        lab = np.repeat(np.repeat(coarse, 8, 1), 8, 2).astype(np.int32)
        lab[:, :2] = 255  # some ignore pixels
        yield {"image": img, "label": lab}
