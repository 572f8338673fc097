"""ImageNet-22k -> 1k logits remap (TinyViT RemapLayer).

TinyViT/models/remap_layer.py:10-25: a 22k-class teacher's logits are
gathered at the 1k classes' 22k indices to produce 1k logits (used when
saving distillation logits from the 22k teacher, save_logits.py:30-31).
The mapping file (imagenet_1kto22k.txt: line i = 22k index of 1k class i,
-1 if absent) is user-supplied public data.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def load_1k_to_22k(path: str) -> np.ndarray:
    mapping = np.asarray([int(l.strip()) for l in open(path) if l.strip()],
                         np.int32)
    assert mapping.shape[0] == 1000, mapping.shape
    return mapping


def remap_22k_to_1k(logits_22k: jnp.ndarray, mapping: np.ndarray
                    ) -> jnp.ndarray:
    """(B, 21841) -> (B, 1000); classes missing from 22k get -inf."""
    safe = np.where(mapping >= 0, mapping, 0)
    out = logits_22k[:, jnp.asarray(safe)]
    missing = jnp.asarray(mapping < 0)
    return jnp.where(missing[None, :], -jnp.inf, out)
