"""Attention with a trained per-offset bias table (LeViT/TinyViT style).

Equivalent of TinyViT's Attention (TinyViT/models/tiny_vit.py:216-286):
pre-LN, fused QKV projection with asymmetric head dims (q/k get key_dim, v gets
d = attn_ratio*key_dim), a learned (num_heads, num_offsets) bias table gathered
through a static (N, N) index map, softmax, value matmul, output projection.

TPU notes: the bias gather `biases[:, idxs]` has a static index constant, so
XLA folds it to one gather feeding the attention add; batch/window dims are
flattened so the QK^T and AV matmuls are large MXU-friendly batched GEMMs.
A fused Pallas kernel (ops/pallas) can replace the softmax path; this module
is the reference implementation and the test oracle for it.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cream_tpu.ops.common import attention_bias_indices


class BiasAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float = 4.0
    resolution: tuple[int, int] = (7, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, _ = x.shape
        h = self.num_heads
        kd = self.key_dim
        d = int(self.attn_ratio * kd)
        idxs, num_offsets = attention_bias_indices(self.resolution)
        assert N == idxs.shape[0], f"tokens {N} != resolution {self.resolution}"

        biases = self.param("attention_biases", nn.initializers.zeros,
                            (h, num_offsets), jnp.float32)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(h * (2 * kd + d), dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, h, 2 * kd + d)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)

        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (kd ** -0.5)
        attn = attn + biases[:, idxs][None].astype(attn.dtype)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(B, N, h * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
