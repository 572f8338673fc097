"""Elastic (weight-entangled) primitives for one-shot supernets — TPU-first.

The reference slices weight views per sampled config every batch
(AutoFormer/model/module/Linear_super.py:71-75, qkv_super.py:72-77), which
under XLA would retrace/recompile per config. Here the supernet always runs
at SUPER shapes and actives are expressed as prefix masks built from traced
scalars, so the whole config lattice shares ONE compiled program:

    y = (x·maskin) W  · maskout           ==  y = x[..., :in] W[:in, :out]

(the masked matmul equals the sliced one because masked input columns
contribute zero and masked output channels are zeroed afterwards).
LayerNorm uses masked statistics so mean/var are computed over the active
prefix only — bit-matching the sliced reference computation.

For deployment, `slice` methods materialize the true sliced weights
(including the qkv interleaved row order, qkv_super.py:75) to hand to a
plain fixed-shape subnet.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def prefix_mask(size: int, active, dtype=jnp.float32) -> jnp.ndarray:
    """(size,) mask: 1.0 where index < active. `active` may be traced."""
    return (jnp.arange(size) < active).astype(dtype)


class ElasticDense(nn.Module):
    """Dense at super dims; call with traced (in_active, out_active)."""
    super_in: int
    super_out: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, in_active, out_active) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (self.super_in, self.super_out), jnp.float32)
        m_in = prefix_mask(self.super_in, in_active, self.dtype)
        m_out = prefix_mask(self.super_out, out_active, self.dtype)
        y = (x * m_in) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.super_out,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y * m_out


class ElasticLayerNorm(nn.Module):
    """LayerNorm with masked statistics over the active channel prefix."""
    super_dim: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, active) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones,
                           (self.super_dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.super_dim,), jnp.float32)
        m = prefix_mask(self.super_dim, active, jnp.float32)
        d = jnp.maximum(active, 1).astype(jnp.float32)
        xf = x.astype(jnp.float32) * m
        mean = xf.sum(-1, keepdims=True) / d
        var = (((xf - mean) * m) ** 2).sum(-1, keepdims=True) / d
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return ((y * scale + bias) * m).astype(self.dtype)


def slice_dense(params: dict, in_dim: int, out_dim: int) -> dict:
    """Materialize a sliced Dense param dict from elastic params."""
    out = {"kernel": np.asarray(params["kernel"])[:in_dim, :out_dim]}
    if "bias" in params:
        out["bias"] = np.asarray(params["bias"])[:out_dim]
    return out


def slice_qkv_interleaved(params: dict, in_dim: int, out_dim: int) -> dict:
    """Slice an interleaved qkv kernel (in, 3*super_units) to (in, out) with
    the reference's row order: strided every-3rd up to `out`, concatenated as
    [q; k; v] (qkv_super.py:72-77; kernels here are (in, out) so we slice
    columns where torch slices rows)."""
    k = np.asarray(params["kernel"])[:in_dim]
    cols = np.concatenate([np.arange(i, out_dim, 3) for i in range(3)])
    out = {"kernel": k[:, cols]}
    if "bias" in params:
        out["bias"] = np.asarray(params["bias"])[cols]
    return out


def slice_layernorm(params: dict, dim: int) -> dict:
    return {"scale": np.asarray(params["scale"])[:dim],
            "bias": np.asarray(params["bias"])[:dim]}
