"""Samplers: repeated augmentation (RASampler equivalent).

AutoFormer/lib/samplers.py (DeiT RASampler): each epoch draws ~len(dataset)
indices where every chosen sample appears `repetitions` times with different
augmentations — here the repeat happens naturally because the per-sample aug
seed folds in the repeat counter.
"""
from __future__ import annotations

import numpy as np


def repeated_aug_order(n: int, epoch: int, seed: int = 0,
                       repetitions: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Returns (indices, repeat_ids), each length ~n: n//reps distinct samples
    each repeated `repetitions` times, shuffled."""
    rng = np.random.default_rng(seed + epoch)
    chosen = rng.permutation(n)[: max(n // repetitions, 1)]
    idx = np.repeat(chosen, repetitions)
    rep = np.tile(np.arange(repetitions), len(chosen))
    order = rng.permutation(len(idx))
    return idx[order][:n], rep[order][:n]
