"""Tar-shard image-text dataset reader (TinyCLIP's webdataset capability).

Rebuild of the shard pipeline in TinyCLIP/src/training/data.py:35-260: a list
of .tar shards each containing paired members (xxx.jpg + xxx.txt); iterated
with a resumable deterministic shuffle (detshuffle2 semantics: the shuffle is
a pure function of (seed, epoch)), decoded and batched host-side.

Also a CsvDataset equivalent: filepath<TAB>caption rows.
"""
from __future__ import annotations

import io
import os
import tarfile
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
from PIL import Image

from cream_tpu.data.transforms import eval_preprocess_config, preprocess_pil


def iter_tar_pairs(shard_path: str) -> Iterator[tuple[str, bytes, bytes]]:
    """Yield (key, image_bytes, text_bytes) pairs from one shard."""
    with tarfile.open(shard_path) as tf:
        pending: dict[str, dict] = {}
        for member in tf:
            if not member.isfile():
                continue
            key, ext = os.path.splitext(member.name)
            ext = ext.lower().lstrip(".")
            if ext not in ("jpg", "jpeg", "png", "webp", "txt", "json"):
                continue
            d = pending.setdefault(key, {})
            d[ext] = tf.extractfile(member).read()
            img = next((d[e] for e in ("jpg", "jpeg", "png", "webp") if e in d),
                       None)
            if img is not None and "txt" in d:
                yield key, img, d["txt"]
                del pending[key]


class ShardListDataset:
    """Deterministically-shuffled iterator over image-text tar shards."""

    def __init__(self, shards: list[str], seed: int = 0):
        self.shards = sorted(shards)
        self.seed = seed

    def epoch_iter(self, epoch: int, start_sample: int = 0
                   ) -> Iterator[tuple[str, bytes, bytes]]:
        """The shuffle is a pure function of (seed, epoch) — detshuffle2
        semantics (TinyCLIP/src/training/data.py:35) — so `start_sample`
        fast-forwards deterministically into the epoch: mid-epoch resume
        replays the identical stream from sample N on."""
        order = np.arange(len(self.shards))
        np.random.default_rng(self.seed + epoch).shuffle(order)  # detshuffle2
        skipped = 0
        for si in order:
            for pair in iter_tar_pairs(self.shards[si]):
                if skipped < start_sample:
                    skipped += 1
                    continue
                yield pair


def image_text_loader(dataset: ShardListDataset, tokenizer, epoch: int,
                      batch_size: int, img_size: int = 224,
                      context_length: int = 77, num_workers: int = 8,
                      start_batch: int = 0, native=False) -> Iterator[dict]:
    """Batches of {image (B,H,W,3) CLIP-normalized, text (B,L) tokens}.

    `start_batch` resumes mid-epoch: the first start_batch*batch_size
    samples of the deterministic epoch stream are skipped, so a checkpoint
    carrying iter_in_epoch restarts on exactly the next unseen batch
    (TinyCLIP/src/training/main.py:400 iter_in_epoch resume).
    native: False | True | "auto" — decode/resize JPEG members through the
    C++ pipeline (native/image_pipe.cc), per-pair PIL fallback for non-JPEG
    members; the CLIP-distill workloads are the framework's biggest data
    consumers."""
    from cream_tpu.data import native_pipe

    cfg = eval_preprocess_config(img_size, crop=True, clip=True)
    use_native = (native_pipe.available() if native == "auto"
                  else bool(native))
    if native is True and not native_pipe.available():
        raise RuntimeError("native image pipeline unavailable "
                           "(build native/libimage_pipe.so)")

    def decode(pair):
        _, img_bytes, txt_bytes = pair
        img = preprocess_pil(Image.open(io.BytesIO(img_bytes)), cfg)
        return img, txt_bytes.decode("utf-8", errors="replace").strip()

    def native_images(pairs):
        bufs = [p[1] for p in pairs]
        wh = native_pipe.probe_sizes(bufs)
        params = native_pipe.eval_params(wh, cfg)
        images, status = native_pipe.decode_batch(
            bufs, params, cfg.crop, cfg.mean, cfg.std,
            n_threads=num_workers, allow_prescale=False)
        for j in np.nonzero((status != 0) | (wh[:, 0] <= 0))[0]:
            images[int(j)] = preprocess_pil(
                Image.open(io.BytesIO(bufs[int(j)])), cfg)
        return images

    buf: list = []
    with ThreadPoolExecutor(num_workers) as pool:
        for pair in dataset.epoch_iter(epoch,
                                       start_sample=start_batch * batch_size):
            buf.append(pair)
            if len(buf) == batch_size:
                texts = [p[2].decode("utf-8", errors="replace").strip()
                         for p in buf]
                if use_native:
                    images = native_images(buf)
                else:
                    images = np.stack(
                        [d[0] for d in pool.map(decode, buf)])
                yield {"image": images,
                       "text": tokenizer(texts, context_length)}
                buf = []


class CsvDataset:
    """filepath<TAB>caption rows (TinyCLIP CsvDataset, data.py:16-34)."""

    def __init__(self, csv_path: str, sep: str = "\t",
                 img_key: int = 0, caption_key: int = 1):
        self.root = os.path.dirname(os.path.abspath(csv_path))
        self.rows = []
        with open(csv_path) as f:
            for line in f:
                parts = line.rstrip("\n").split(sep)
                if len(parts) > max(img_key, caption_key):
                    self.rows.append((parts[img_key], parts[caption_key]))

    def __len__(self):
        return len(self.rows)

    def load(self, i: int) -> tuple[Image.Image, str]:
        path, caption = self.rows[i]
        if not os.path.isabs(path):
            path = os.path.join(self.root, path)
        return Image.open(path), caption
