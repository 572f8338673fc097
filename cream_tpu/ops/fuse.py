"""Conv+BN / BN+Linear folding for inference.

Mirrors the deploy-time fusion the reference applies before benchmarking
(Conv2d_BN.fuse at EfficientViT/classification/model/efficientvit.py:23-34,
BN_Linear.fuse at :46-60, applied by replace_batchnorm in
classification/utils.py / model/build.py:173-180). On TPU, XLA already fuses
the inference-time BN affine into the surrounding elementwise graph, so this
exists mainly for (a) exact-parity checkpoint export/eval semantics and (b)
removing the BN params from the deploy pytree.

Layouts are JAX-native: conv kernels are HWIO, linear kernels are (in, out).
"""
from __future__ import annotations

import jax.numpy as jnp


def fold_conv_bn(kernel: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                 mean: jnp.ndarray, var: jnp.ndarray, eps: float = 1e-5
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold y = BN(conv(x, kernel)) into conv(x, k') + b'.

    kernel: (H, W, I, O) HWIO. BN stats are per output channel O.
    """
    scale = gamma / jnp.sqrt(var + eps)           # (O,)
    fused_kernel = kernel * scale[None, None, None, :]
    fused_bias = beta - mean * scale
    return fused_kernel, fused_bias


def fold_bn_linear(kernel: jnp.ndarray, bias: jnp.ndarray | None,
                   gamma: jnp.ndarray, beta: jnp.ndarray,
                   mean: jnp.ndarray, var: jnp.ndarray, eps: float = 1e-5
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold y = Linear(BN1d(x)) into Linear'(x).

    kernel: (in, out) — BN acts on the *input* features (as in the reference's
    BN_Linear classifier head).
    """
    scale = gamma / jnp.sqrt(var + eps)           # (in,)
    shift = beta - mean * scale                    # (in,)
    fused_kernel = kernel * scale[:, None]
    extra = shift @ kernel                         # (out,)
    fused_bias = extra if bias is None else bias + extra
    return fused_kernel, fused_bias
