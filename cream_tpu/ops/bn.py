"""Train-mode BatchNorm core with an MXU-routed backward (A/B-gated).

Why: xplane attribution (round 4, v5e) shows BN-train backward channel-sums
(`sum(dy)`, `sum(dy*xhat)` over (B, H, W)) lowering as VPU reduce fusions on
the batch-minor layouts the conv emitters pick — ~240 GB/s effective vs
~660 GB/s for plain elementwise passes. They are 13.8 ms of EfficientViT-M5's
36 ms train step and a similar slice of the TinyViT stem backward. This core
keeps the forward bit-identical to flax nn.BatchNorm train mode but supplies
a custom_vjp whose channel-sums run as (8, M)·(M, C) `dot_general`s — the MXU
streams the big operand at memory speed instead of strided VPU accumulation.

Semantics match flax nn.BatchNorm(use_running_average=False): biased batch
variance, normalization computed in the module dtype, stats in fp32.
Reference counterpart: torch.nn.BatchNorm2d training mode (used by every
Conv2d_BN in EfficientViT/classification/model/efficientvit.py and
TinyViT/models/tiny_vit.py) — with ONE deliberate difference: running_var
here follows flax and stores the BIASED batch variance, while torch stores
the UNBIASED (Bessel-corrected) one. Normalization uses the biased variance
in both frameworks, so forward parity holds; only checkpoints of the
*running stats themselves* would differ by n/(n-1) if this module were used
for torch-parity training. (The flax-match claim is what the parity tests
pin.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Module-level default for ConvBN sites (A/B knob, like dwconv.DEFAULT_DW_VJP)
DEFAULT_MXU_BN = False


def _moments(x):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mu = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mu)
    return mu, var


def _mxu_colsums(a: jnp.ndarray, b: jnp.ndarray) -> tuple:
    """(sum over rows of a, sum over rows of b) for (M, C) fp32 operands,
    as one stacked (8, M) @ (M, 2C) MXU dot (rows 1-7 of the ones operand are
    padding so the sublane dim isn't 1)."""
    ab = jnp.concatenate([a, b], axis=-1)                  # (M, 2C)
    ones = jnp.zeros((8, a.shape[0]), jnp.float32).at[0].set(1.0)
    s = jax.lax.dot_general(ones, ab, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[0]
    return s[:a.shape[-1]], s[a.shape[-1]:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bn_train_norm(x: jnp.ndarray, mu: jnp.ndarray, var: jnp.ndarray,
                  scale: jnp.ndarray, bias: jnp.ndarray,
                  eps: float) -> jnp.ndarray:
    """y = (x - mu) * rsqrt(var + eps) * scale + bias, with mu/var the batch
    moments OF x (the vjp assumes exactly that: the complete standard BN
    backward — including the paths through mu/var — is folded into dx, and
    mu/var receive zero cotangent, so callers MUST pass `_moments(x)` of the
    same x, not detached or running values)."""
    inv = jax.lax.rsqrt(var + eps) * scale
    return (x.astype(jnp.float32) * inv +
            (bias - mu * inv)).astype(x.dtype)


def _fwd(x, mu, var, scale, bias, eps):
    return bn_train_norm(x, mu, var, scale, bias, eps), (x, mu, var, scale)


def _bwd(eps, res, dy):
    x, mu, var, scale = res
    inv = jax.lax.rsqrt(var + eps)                         # (C,)
    m = x.size // x.shape[-1]
    C = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(m, C)
    dyf = dy.astype(jnp.float32).reshape(m, C)
    xhat = (xf - mu) * inv
    dbeta, dgamma = _mxu_colsums(dyf, dyf * xhat)          # MXU channel sums
    # standard BN backward (grads through mu/var included):
    dx = (scale * inv / m) * (m * dyf - dbeta - xhat * dgamma)
    return (dx.reshape(x.shape).astype(x.dtype),
            jnp.zeros_like(mu),                            # folded into dx
            jnp.zeros_like(var),
            dgamma.astype(scale.dtype),
            dbeta.astype(scale.dtype))


bn_train_norm.defvjp(_fwd, _bwd)
