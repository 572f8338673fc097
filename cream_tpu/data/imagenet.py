"""ImageNet-style datasets + loaders (host-side, thread-pooled).

Covers the reference's data layer capabilities (SURVEY.md §1 cross-cutting):
  * ImageFolder directories (every project)
  * zip-cached ImageNet (MiniViT/Mini-Swin/data/{zipreader,cached_image_folder}
    — read JPEG bytes straight out of a .zip with a member index)
  * deterministic seeded train augs (data/det_aug.py) for the distillation
    logits pipeline
  * synthetic data for smoke tests / benchmarking without the dataset
Batches are numpy NHWC dicts {image, label, index, seed} ready for
device_put onto the mesh.
"""
from __future__ import annotations

import io
import os
import threading
import zipfile
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
from PIL import Image

from cream_tpu.data.det_aug import sample_seed, train_transform
from cream_tpu.data.samplers import repeated_aug_order
from cream_tpu.data.transforms import EvalPreprocess, eval_preprocess_config, preprocess_pil

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ZipReader:
    """Thread-safe JPEG-from-zip reader (MiniViT zipreader.py capability)."""

    def __init__(self, path: str):
        self.path = path
        self._local = threading.local()

    def _zf(self) -> zipfile.ZipFile:
        if not hasattr(self._local, "zf"):
            self._local.zf = zipfile.ZipFile(self.path, "r")
        return self._local.zf

    def namelist(self) -> list[str]:
        return self._zf().namelist()

    def read_image(self, name: str) -> Image.Image:
        return Image.open(io.BytesIO(self._zf().read(name)))


class ImageFolder:
    """(path, class_id) listing from class-subdirectory layout."""

    def __init__(self, root: str, class_to_idx: dict | None = None):
        self.root = root
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = class_to_idx or {c: i for i, c in enumerate(classes)}
        self.samples: list[tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith(IMG_EXTS):
                    self.samples.append((os.path.join(cdir, f),
                                         self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def load(self, i: int) -> tuple[Image.Image, int]:
        path, label = self.samples[i]
        return Image.open(path), label

    def load_bytes(self, i: int) -> tuple[bytes, int]:
        path, label = self.samples[i]
        with open(path, "rb") as fh:
            return fh.read(), label


def sub_imagenet(dataset: "ImageFolder", per_class: int = 100,
                 seed: int = 0) -> "ImageFolder":
    """Fixed per-class subset with the reference's exact membership.

    AutoFormer evolution evaluates candidates on EVO_IMNET — a subImageNet
    folder built once by lib/subImageNet.py: `random.seed(0)` then, per
    class in sorted order, `random.sample(sorted(os.listdir(class)), 100)`.
    This reproduces that selection in-place (same python-random sequence, no
    file copying), so the candidate-fitness population is the same fixed,
    order-independent set — not a loader-order-dependent truncation."""
    import copy
    import random

    rng = random.Random(seed)
    by_class: dict[int, list[tuple[str, int]]] = {}
    for path, label in dataset.samples:
        by_class.setdefault(label, []).append((path, label))
    sub = copy.copy(dataset)
    sub.samples = []
    for label in sorted(by_class):
        entries = sorted(by_class[label], key=lambda e: os.path.basename(e[0]))
        take = rng.sample(entries, min(per_class, len(entries)))
        sub.samples.extend(take)
    return sub


class ZipImageFolder:
    """ImageFolder over a zip archive: members named class/img.jpeg."""

    def __init__(self, zip_path: str):
        self.reader = ZipReader(zip_path)
        names = [n for n in self.reader.namelist()
                 if n.lower().endswith(IMG_EXTS)]
        classes = sorted({n.split("/")[0] for n in names})
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [(n, self.class_to_idx[n.split("/")[0]])
                        for n in sorted(names)]

    def __len__(self):
        return len(self.samples)

    def load(self, i: int) -> tuple[Image.Image, int]:
        name, label = self.samples[i]
        return self.reader.read_image(name), label

    def load_bytes(self, i: int) -> tuple[bytes, int]:
        name, label = self.samples[i]
        return self.reader._zf().read(name), label


class IN22KDataset:
    """ImageNet-22k in TinyViT's layout (data/imagenet22k_dataset.py:14-68):
    `data_root/in22k_image_names.txt` lists image ids 'nXXXXXXXX_NNNN';
    each class lives in its own `data_root/nXXXXXXXX.zip` whose members are
    `{id}.jpeg`. Class ids = sorted wnid order (the 22k->1k remap in
    zoo/remap.py keys off the same ordering)."""

    def __init__(self, data_root: str, fname_format: str = "{}.jpeg"):
        self.data_root = data_root
        self.fname_format = fname_format
        info = os.path.join(data_root, "in22k_image_names.txt")
        folders: dict[str, list[str]] = {}
        with open(info) as fh:
            for iname in fh:
                iname = iname.strip()
                if not iname:
                    continue
                folders.setdefault(iname[:iname.index("_")], []).append(iname)
        class_names = sorted(folders)
        self.nb_classes = len(class_names)
        self.class_to_idx = {c: i for i, c in enumerate(class_names)}
        self.samples = [(iname, cid)
                        for cid, cname in enumerate(class_names)
                        for iname in folders[cname]]
        self._readers: dict[str, ZipReader] = {}

    def __len__(self):
        return len(self.samples)

    def load(self, i: int) -> tuple[Image.Image, int]:
        iname, label = self.samples[i]
        cls = iname[:iname.index("_")]
        reader = self._readers.get(cls)
        if reader is None:
            reader = self._readers[cls] = ZipReader(
                os.path.join(self.data_root, cls + ".zip"))
        return reader.read_image(self.fname_format.format(iname)), label

    def load_bytes(self, i: int) -> tuple[bytes, int]:
        iname, label = self.samples[i]
        cls = iname[:iname.index("_")]
        reader = self._readers.get(cls)
        if reader is None:
            reader = self._readers[cls] = ZipReader(
                os.path.join(self.data_root, cls + ".zip"))
        return reader._zf().read(self.fname_format.format(iname)), label

    def get_keys(self) -> list[str]:
        return [s[0] for s in self.samples]


class SyntheticDataset:
    """Deterministic random images; for smoke tests and throughput harnesses."""

    def __init__(self, n: int = 1024, img_size: int = 224, num_classes: int = 1000):
        self.n, self.img_size, self.num_classes = n, img_size, num_classes

    def __len__(self):
        return self.n

    def load(self, i: int):
        rng = np.random.default_rng(i)
        arr = rng.integers(0, 256, (self.img_size, self.img_size, 3),
                           dtype=np.uint8)
        return Image.fromarray(arr), int(rng.integers(self.num_classes))


def prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Run a batch iterator on a background thread with a bounded queue so
    host-side decode/augment overlaps the device step (the role of torch
    DataLoader's prefetch_factor; jit dispatch is async, so one queue of
    ready numpy batches is all the overlap TPU needs)."""
    import queue

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def run():
        try:
            for item in it:
                q.put(item)
            q.put(stop)
        except BaseException as e:  # surface loader errors on the consumer
            q.put(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _use_native(dataset, native) -> bool:
    from cream_tpu.data import native_pipe
    if native is False:
        return False
    ok = native_pipe.available() and hasattr(dataset, "load_bytes")
    if native is True and not ok:
        raise RuntimeError("native image pipeline unavailable "
                           "(build native/libimage_pipe.so) or dataset has "
                           "no load_bytes")
    return ok if native == "auto" else bool(native)


def _native_batch(dataset, idx, params_fn, out_size, mean, std, pil_fn,
                  n_threads, allow_prescale=True):
    """Decode a batch through native_pipe; per-image PIL fallback on any
    decode/parse failure (non-JPEG bytes, truncation)."""
    from cream_tpu.data import native_pipe

    pairs = [dataset.load_bytes(int(i)) for i in idx]
    bufs = [p[0] for p in pairs]
    labels = np.asarray([p[1] for p in pairs], np.int32)
    wh = native_pipe.probe_sizes(bufs)
    params = params_fn(wh)
    images, status = native_pipe.decode_batch(
        bufs, params, out_size, mean, std, n_threads=n_threads,
        allow_prescale=allow_prescale)
    for j in np.nonzero((status != 0) | (wh[:, 0] <= 0))[0]:
        images[int(j)] = pil_fn(int(j))  # pil_fn takes the batch position
    return images, labels


def eval_loader(dataset, batch_size: int, img_size: int = 224,
                crop: bool = True, clip_norm: bool = False,
                num_workers: int = 8, pad_final: bool = True,
                native=False, shard: tuple | None = None) -> Iterator[dict]:
    """Deterministic eval batches; final partial batch padded with label=-1
    (the eval step masks them), so shapes stay static under jit.

    native: False | True | "auto" — route decode/resize/normalize through
    the C++ pipeline (native/image_pipe.cc) when available; augmentation
    *decisions* are identical, resampling matches PIL within ~1/255 (see
    data/native_pipe.py). Keep False for golden-logit comparisons.
    shard: (process_index, process_count) — this host reads only its strided
    subset (DistributedSampler role); batch_size is then per-host. Every
    host emits the SAME number of (padded) batches regardless of how the
    remainder falls, so multi-host collectives can't desynchronize."""
    from cream_tpu.data import native_pipe

    cfg = eval_preprocess_config(img_size, crop=crop, clip=clip_norm)

    def load_one(i):
        img, label = dataset.load(i)
        return preprocess_pil(img, cfg), label

    all_idx = np.arange(len(dataset))
    if shard is not None:
        # host-count-invariant step count: size of the largest host shard
        longest = -(-len(all_idx) // shard[1])
        n_steps = -(-longest // batch_size)
        all_idx = all_idx[shard[0]::shard[1]]
        pad_final = True
    else:
        n_steps = -(-len(all_idx) // batch_size)
    n = len(all_idx)
    use_native = _use_native(dataset, native)

    def pil_batch(idx, pool):
        results = list(pool.map(load_one, idx))
        images = (np.stack([r[0] for r in results]) if idx else
                  np.zeros((0, cfg.crop, cfg.crop, 3), np.float32))
        return images, np.asarray([r[1] for r in results], np.int32)

    with ThreadPoolExecutor(num_workers) as pool:
        for k in range(n_steps):
            idx = all_idx[k * batch_size:min((k + 1) * batch_size, n)].tolist()
            if use_native and idx:
                images, labels = _native_batch(
                    dataset, idx, lambda wh: native_pipe.eval_params(wh, cfg),
                    cfg.crop, cfg.mean, cfg.std,
                    lambda j: load_one(idx[j])[0], num_workers,
                    allow_prescale=False)
            else:
                images, labels = pil_batch(idx, pool)
            index = np.asarray(idx, np.int32)
            if pad_final and len(idx) < batch_size:
                pad = batch_size - len(idx)
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
                labels = np.concatenate([labels, -np.ones(pad, np.int32)])
                index = np.concatenate([index, -np.ones(pad, np.int32)])
            yield {"image": images, "label": labels, "index": index}


def train_loader(dataset, batch_size: int, epoch: int, base_seed: int = 0,
                 img_size: int = 224, num_workers: int = 8,
                 shuffle: bool = True, drop_last: bool = True,
                 mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 transform=None, repeated_aug: int = 0,
                 native=False, shard: tuple | None = None) -> Iterator[dict]:
    """Seeded training batches. Every sample carries its aug seed so saved
    teacher logits can be replayed (TinyViT distillation semantics).

    transform: optional fn(PIL, seed) -> float32 HWC (e.g.
    det_aug.make_train_transform for the full RandAugment recipe); defaults
    to the plain RRC+flip pipeline.
    repeated_aug: >0 enables the RASampler behavior (AutoFormer/lib/
    samplers.py): each epoch visits ~n/reps distinct samples, each repeated
    `repeated_aug` times with different aug seeds.
    native: route the plain RRC+flip pixel path through the C++ pipeline
    (same seeded crop/flip decisions — native_pipe.train_params); only valid
    with transform=None (the full RandAugment recipe stays PIL).
    shard: (process_index, process_count) — this host's strided slice of the
    epoch order. The order/seeds are derived from (base_seed, epoch) BEFORE
    slicing, so the global sample/aug sequence is host-count-invariant."""
    if native and transform is not None:
        raise ValueError("native train path covers only the default "
                         "RRC+flip transform")
    n = len(dataset)
    if repeated_aug and repeated_aug > 1:
        order, reps = repeated_aug_order(n, epoch, base_seed, repeated_aug)
    else:
        order = np.arange(n)
        reps = np.zeros(n, np.int64)
        if shuffle:
            perm = np.random.default_rng(base_seed + epoch).permutation(n)
            order = order[perm]

    if shard is not None:
        # equal per-host length (floor) so every host runs the same number
        # of steps — a trailing remainder of < count samples is dropped,
        # like DistributedSampler's drop_last
        per_host = len(order) // shard[1]
        order = order[shard[0]::shard[1]][:per_host]
        reps = reps[shard[0]::shard[1]][:per_host]

    if transform is None:
        def transform(img, seed):
            return train_transform(img, seed, img_size, mean, std)

    def load_one(args):
        i, rep = args
        img, label = dataset.load(int(i))
        # fold the repeat id into the seed so repeated samples get distinct
        # augmentations (the RASampler point)
        seed = sample_seed(base_seed + 101 * int(rep), epoch, int(i))
        return transform(img, seed), label, seed

    m = len(order)
    end = m - (m % batch_size) if drop_last else m
    if _use_native(dataset, native):
        from cream_tpu.data import native_pipe
        for start in range(0, end, batch_size):
            idx = order[start:start + batch_size]
            rr = reps[start:start + batch_size]
            seeds = [sample_seed(base_seed + 101 * int(r), epoch, int(i))
                     for i, r in zip(idx, rr)]
            images, labels = _native_batch(
                dataset, idx,
                lambda wh: native_pipe.train_params(wh, seeds, img_size),
                img_size, mean, std,
                lambda j: load_one((idx[j], rr[j]))[0],
                num_workers)
            yield {"image": images, "label": labels,
                   "index": np.asarray(idx, np.int32),
                   "seed": np.asarray(seeds, np.int32)}
        return
    with ThreadPoolExecutor(num_workers) as pool:
        for start in range(0, end, batch_size):
            idx = order[start:start + batch_size]
            rr = reps[start:start + batch_size]
            results = list(pool.map(load_one, zip(idx, rr)))
            yield {
                "image": np.stack([r[0] for r in results]),
                "label": np.asarray([r[1] for r in results], np.int32),
                "index": np.asarray(idx, np.int32),
                "seed": np.asarray([r[2] for r in results], np.int32),
            }
