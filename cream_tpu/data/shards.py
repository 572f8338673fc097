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
                      start_batch: int = 0) -> Iterator[dict]:
    """Batches of {image (B,H,W,3) CLIP-normalized, text (B,L) tokens}.

    `start_batch` resumes mid-epoch: the first start_batch*batch_size
    samples of the deterministic epoch stream are skipped, so a checkpoint
    carrying iter_in_epoch restarts on exactly the next unseen batch
    (TinyCLIP/src/training/main.py:400 iter_in_epoch resume)."""
    cfg = eval_preprocess_config(img_size, crop=True, clip=True)

    def decode(pair):
        _, img_bytes, txt_bytes = pair
        img = preprocess_pil(Image.open(io.BytesIO(img_bytes)), cfg)
        return img, txt_bytes.decode("utf-8", errors="replace").strip()

    buf: list = []
    with ThreadPoolExecutor(num_workers) as pool:
        for pair in dataset.epoch_iter(epoch,
                                       start_sample=start_batch * batch_size):
            buf.append(pair)
            if len(buf) == batch_size:
                decoded = list(pool.map(decode, buf))
                yield {"image": np.stack([d[0] for d in decoded]),
                       "text": tokenizer([d[1] for d in decoded],
                                         context_length)}
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
