"""PRNG stream helper: explicit, splittable randomness.

Replaces the reference's global-seed habits (torch.manual_seed scattered per
trainer, and TinyViT's process-global PCG64 swap in
TinyViT/data/augmentation/aug_random.py:1-61) with explicit jax.random keys.
Deterministic per-(epoch, sample) seeds for the distillation-logits pipeline are
derived with jax.random.fold_in, which is stable across hosts and runs.
"""
from __future__ import annotations

import jax


class RngStream:
    """A named, fold-in-based PRNG stream.

    stream = RngStream(seed)
    k1 = stream.key("dropout", step)      # deterministic in (name, step)
    """

    def __init__(self, seed: int):
        self._base = jax.random.key(seed)

    def key(self, name: str, *indices: int) -> jax.Array:
        k = jax.random.fold_in(self._base, _stable_hash(name))
        for i in indices:
            k = jax.random.fold_in(k, i)
        return k


def _stable_hash(s: str) -> int:
    # Python's hash() is salted per-process; use a stable FNV-1a instead.
    h = 2166136261
    for b in s.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
