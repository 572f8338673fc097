"""ctypes driver for the native C++ image pipeline (native/image_pipe.cc).

The reference's loaders get their throughput from torch DataLoader's C++
worker pool; this is the TPU build's equivalent: JPEG decode (DCT-domain
prescaling when heavily downscaling), Pillow-algorithm antialiased bicubic
resampling, crop/flip/normalize — all in a C++ thread pool, one call per
batch. Python keeps every seeded *decision* (sample order, RRC boxes, flip
coins — data/det_aug.py), so augmentation semantics are identical to the
PIL path; only resampling arithmetic differs (fp32 vs Pillow's fixed-point,
within ~1/255 per channel — tests/test_native_pipe.py pins the tolerance).

Use `available()` to gate; loaders fall back to PIL per-image on decode
errors (non-JPEG bytes, truncated files) via the returned status array.
The exact-replay distillation contract (saved teacher logits keyed by aug
seed) pins the PIL path; the native path is the throughput option for
training/eval runs that don't replay logits across loader implementations.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_FILTERS = {"bilinear": 1, "bicubic": 2}


def _maybe_build(path: str) -> None:
    """(Re)build the .so when missing or older than its source. The .so is
    gitignored, so a fresh checkout — or an edit to image_pipe.cc — would
    otherwise silently run a stale/absent library (round 3's loader bench
    regression was exactly a stale build)."""
    src = os.path.join(os.path.dirname(path), "image_pipe.cc")
    if not os.path.exists(src):
        return  # installed layout without sources: use whatever .so is there
    if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(src):
        return
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.dirname(path),
                        "libimage_pipe.so"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass  # fall through: CDLL below reports unavailability


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get(
        "CREAM_TPU_IMAGE_PIPE",
        os.path.join(os.path.dirname(__file__), "..", "..", "native",
                     "libimage_pipe.so"))
    path = os.path.abspath(path)
    _maybe_build(path)
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ip_sizes.restype = ctypes.c_int
    lib.ip_sizes.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.ip_batch.restype = ctypes.c_int
    lib.ip_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _buf_arrays(bufs: list) -> tuple:
    n = len(bufs)
    arr = (ctypes.c_char_p * n)(*bufs)
    lens = np.asarray([len(b) for b in bufs], np.int64)
    return (ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), arr, lens)


def probe_sizes(bufs: list) -> np.ndarray:
    """(n, 2) int32 of (width, height) per JPEG; (0, 0) = unparseable."""
    lib = _load()
    n = len(bufs)
    wh = np.zeros((n, 2), np.int32)
    bp, lp, _k1, _k2 = _buf_arrays(bufs)
    lib.ip_sizes(bp, lp, n, wh.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return wh


def decode_batch(bufs: list, params: np.ndarray, out_size: int,
                 mean, std, filter: str = "bicubic",
                 n_threads: int = 0, allow_prescale: bool = True) -> tuple:
    """Decode + geometry + normalize a batch.

    params: (n, 9) int32 rows (x0, y0, box_w, box_h, resample_w, resample_h,
    crop_x, crop_y, flip) in full-resolution source coordinates.
    allow_prescale: permit DCT-domain reduced decode when heavily
    downscaling (big speedup; diverges further from PIL on high-frequency
    content — disable for parity-critical eval).
    Returns (images (n, out, out, 3) float32, status (n,) int32 — 0 ok)."""
    lib = _load()
    n = len(bufs)
    params = np.ascontiguousarray(params, np.int32)
    assert params.shape == (n, 9)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    status = np.zeros(n, np.int32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if n_threads <= 0:
        n_threads = min(32, (os.cpu_count() or 1) * 2)
    bp, lp, _k1, _k2 = _buf_arrays(bufs)
    rc = lib.ip_batch(
        bp, lp, n,
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_size, out_size, _FILTERS[filter], int(allow_prescale),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        status[:] = 99
    return out, status


def eval_params(wh: np.ndarray, cfg) -> np.ndarray:
    """Per-image eval geometry rows (shorter-side resize + center crop),
    matching transforms.preprocess_pil's size math."""
    from cream_tpu.data.transforms import crop_offsets, resize_size

    n = wh.shape[0]
    params = np.zeros((n, 9), np.int32)
    for i, (w, h) in enumerate(wh):
        if w <= 0 or h <= 0:
            continue
        nw, nh = resize_size(int(w), int(h), cfg.resize_shorter)
        left, top = crop_offsets(nw, nh, cfg.crop)
        params[i] = (0, 0, w, h, nw, nh, left, top, 0)
    return params


def train_params(wh: np.ndarray, seeds, size: int, scale=(0.08, 1.0),
                 ratio=(3 / 4, 4 / 3), hflip: float = 0.5) -> np.ndarray:
    """Per-image seeded RRC + flip geometry — the same rng consumption
    sequence as det_aug.train_transform (box then flip coin), so a given
    (image, seed) pair crops and flips identically under both pipelines."""
    from cream_tpu.data.det_aug import rrc_box

    n = wh.shape[0]
    params = np.zeros((n, 9), np.int32)
    for i, (w, h) in enumerate(wh):
        if w <= 0 or h <= 0:
            continue
        rng = np.random.default_rng(int(seeds[i]))
        x0, y0, bw, bh = rrc_box(int(w), int(h), rng, scale, ratio)
        flip = 1 if rng.random() < hflip else 0  # always consume, like train_transform
        params[i] = (x0, y0, bw, bh, size, size, 0, 0, flip)
    return params
