"""Shared small ops: stochastic depth, attention-bias index tables."""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
              rng: jax.Array | None = None) -> jnp.ndarray:
    """Stochastic depth on the residual branch (per-sample).

    Matches timm DropPath semantics used throughout the reference
    (e.g. TinyViT/models/tiny_vit.py:53-61, EfficientViT Residual drop at
    EfficientViT/classification/model/efficientvit.py:84-89): keep with prob
    1-rate and rescale by 1/(1-rate).
    """
    if deterministic or rate == 0.0:
        return x
    if rng is None:
        raise ValueError("drop_path needs an rng in training mode")
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape=shape)
    return x * mask.astype(x.dtype) / keep


def attention_bias_indices(resolution: tuple[int, int]) -> tuple[np.ndarray, int]:
    """LeViT-style per-offset attention bias index table.

    For every ordered pair of positions (p1, p2) on an H×W grid, bucket by the
    absolute offset (|dy|, |dx|); buckets are numbered in first-seen order while
    scanning pairs row-major. Returns (idxs[N, N] int32, num_offsets).

    This reproduces the table built in TinyViT/models/tiny_vit.py:237-252 and
    EfficientViT/classification/model/efficientvit.py:136-149 so released
    checkpoints' `attention_biases` rows line up bucket-for-bucket.

    Pure host-side precompute (numpy); the jit graph only sees a constant
    gather `biases[:, idxs]`.
    """
    H, W = resolution
    points = list(itertools.product(range(H), range(W)))
    offsets: dict[tuple[int, int], int] = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    N = len(points)
    return np.asarray(idxs, dtype=np.int32).reshape(N, N), len(offsets)
