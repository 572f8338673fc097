"""Core building-block modules (flax.linen), NHWC, TPU-native.

These are the unified equivalents of the blocks every reference project
re-implements: Conv2d_BN (TinyViT/models/tiny_vit.py:28-50,
EfficientViT/classification/model/efficientvit.py:13-34), BN_Linear
(efficientvit.py:37-60), MBConv (tiny_vit.py:84-122), the LN-prefixed MLP
(tiny_vit.py:193-213).

Conventions:
  * images are NHWC (TPU conv layout) — never NCHW
  * BatchNorm: momentum 0.9 (== torch momentum 0.1), eps 1e-5, batch stats in
    the 'batch_stats' collection; train mode via `train=True` + mutable pass
  * compute dtype can be bf16 via the `dtype` attr; params stay fp32
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from cream_tpu.ops.common import drop_path
from cream_tpu.nn.act import gelu

Dtype = Any


class _DWConv3x3(nn.Module):
    """Depthwise 3x3 conv (stride 1 or 2, pad 1) via ops.dwconv's Pallas
    kernel variants ("wgrad" = XLA fwd/dx + Pallas weight-grad; True = fully
    fused) with XLA fallback.

    Param tree ("kernel", HWIO (3, 3, 1, C), lecun_normal) matches nn.Conv
    with feature_group_count=C exactly, so checkpoints are interchangeable
    with the plain path."""
    features: int
    stride: int = 1
    mode: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cream_tpu.ops.dwconv import dw_conv3x3_auto, dw_conv3x3s2_auto
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features), jnp.float32)
        fn = dw_conv3x3_auto if self.stride == 1 else dw_conv3x3s2_auto
        return fn(x.astype(self.dtype), kernel.astype(self.dtype),
                  mode=self.mode)


# Route stride-s 1x1 groups=1 convs through an explicit channel dot
# (x[::s, ::s] @ W) instead of nn.Conv/conv_general_dilated. Hypothesis under
# test: XLA's TPU conv emitters impose batch-minor operand layouts (the
# round-4/5 "layout copies" buckets: M0 2.22 of 7.45 ms, TinyViT train
# 8.8 of 147 ms) even on pointwise convs, while a dot_general lets the
# row-major layout propagate. Param tree is IDENTICAL to the nn.Conv path
# (submodule "conv", kernel (1,1,C,F), lecun_normal), so checkpoints and
# oracles are unaffected by the flag. A/B: tools/c11_ab.py.
DEFAULT_CONV1X1_DOT = False


class _Conv1x1Dot(nn.Module):
    """Pointwise conv as einsum('bhwc,cf->bhwf'); stride via input slicing
    (valid because ConvBN 1x1 sites always use padding=0)."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], self.features), jnp.float32)
        if self.stride > 1:
            x = x[:, ::self.stride, ::self.stride, :]
        return jnp.einsum("bhwc,cf->bhwf", x.astype(self.dtype),
                          kernel[0, 0].astype(self.dtype))


class MXUBatchNorm(nn.Module):
    """Train-mode BatchNorm, variable-tree-identical to flax nn.BatchNorm
    (params scale/bias, batch_stats mean/var, same momentum/eps semantics)
    but normalizing through ops/bn.py:bn_train_norm — a custom_vjp whose
    backward channel-sums run as MXU dots instead of the VPU-strided reduce
    fusions XLA emits on batch-minor conv layouts (the round-4 xplane
    attribution's biggest train bucket). A/B-gated via ops.bn.DEFAULT_MXU_BN;
    only ever used when train=True (eval BN folds into the conv)."""
    epsilon: float = 1e-5
    momentum: float = 0.9
    scale_init: Any = nn.initializers.ones
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cream_tpu.ops import bn as bn_ops
        C = x.shape[-1]
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        mu, var = bn_ops._moments(x)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mu)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return bn_ops.bn_train_norm(x, mu, var, scale, bias, self.epsilon)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm, NHWC. `groups=features` gives depthwise.

    `dw_vjp` routes a depthwise-3x3 conv through ops/dwconv.py's Pallas
    variants: "wgrad" keeps the XLA fwd/dx convs and swaps ONLY the weight
    gradient (the batch-group conv that drags batch-minor layouts through the
    stem) for a Pallas one-pass kernel; True is the fully-fused fwd+bwd
    (measured full-train-step LOSER, kept for experiments); None defers to
    ops.dwconv.DEFAULT_DW_VJP (the measured global verdict)."""
    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    bn_weight_init: float = 1.0
    dw_vjp: Any = None
    conv1x1_dot: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from cream_tpu.ops.dwconv import default_dw_vjp, is_dw3x3_any
        k = self.kernel_size
        use_dw = default_dw_vjp() if self.dw_vjp is None else self.dw_vjp
        use_dot = (DEFAULT_CONV1X1_DOT if self.conv1x1_dot is None
                   else self.conv1x1_dot)
        if (use_dw and x.shape[-1] == self.features
                and is_dw3x3_any(k, self.stride, self.padding, self.groups,
                                 self.features)):
            x = _DWConv3x3(self.features, stride=self.stride, mode=use_dw,
                           dtype=self.dtype, name="conv")(x)
        elif use_dot and k == 1 and self.groups == 1 and self.padding == 0:
            x = _Conv1x1Dot(self.features, stride=self.stride,
                            dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.features, (k, k),
                        strides=(self.stride, self.stride),
                        padding=[(self.padding, self.padding)] * 2,
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        from cream_tpu.ops import bn as bn_ops
        if train and bn_ops.DEFAULT_MXU_BN:
            x = MXUBatchNorm(scale_init=nn.initializers.constant(
                self.bn_weight_init), dtype=self.dtype, name="bn")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             scale_init=nn.initializers.constant(self.bn_weight_init),
                             name="bn")(x)
        return x


class BNLinear(nn.Module):
    """BatchNorm1d on features then Linear — the EfficientViT classifier head."""
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     kernel_init=nn.initializers.truncated_normal(0.02),
                     name="linear")(x)
        return x


class MBConv(nn.Module):
    """Inverted-residual MBConv: 1x1 expand → 3x3 depthwise → 1x1 project, all
    Conv+BN with GELU between, residual add then GELU.

    A fused Pallas kernel exists (ops/pallas/mbconv.py) but is OFF by
    default: measured on v5e at the TinyViT stage-0 shape (bs256, 56x56x96,
    expand 4) the op is matmul + VPU-serialization bound, not HBM bound —
    the kernel's floor is 3.57 ms/batch with a free activation and 4.85 ms
    with the faithful fp32 tanh GELU vs 4.39 ms for this XLA path, because
    the in-kernel MXU matmuls and VPU depthwise/GELU cannot overlap the way
    XLA pipelines them across the batch. Kept for shapes where VMEM
    residency wins (small batch / larger expand) and as the measured
    record."""
    features: int
    expand_ratio: float = 4.0
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(x.shape[-1] * self.expand_ratio)

        if self.use_pallas and not train and not self.is_initializing():
            from cream_tpu.nn.attention import _on_tpu
            from cream_tpu.ops.pallas.mbconv import (fold_mbconv_variables,
                                                     fused_mbconv,
                                                     supports_shape)
            _, H, W, C = x.shape
            if (_on_tpu() and C == self.features
                    and supports_shape(H, W, C, self.expand_ratio,
                                       self.dtype)
                    and "batch_stats" in self.variables):
                ops = fold_mbconv_variables(self.variables, self.dtype)
                return fused_mbconv(x, *ops)

        shortcut = x
        x = ConvBN(hidden, 1, dtype=self.dtype, name="conv1")(x, train)
        x = gelu(x)
        x = ConvBN(hidden, 3, 1, 1, groups=hidden, dtype=self.dtype, name="conv2")(x, train)
        x = gelu(x)
        x = ConvBN(self.features, 1, bn_weight_init=0.0, dtype=self.dtype, name="conv3")(x, train)
        if self.drop_path_rate > 0.0:
            rng = self.make_rng("drop_path") if train else None
            x = drop_path(x, self.drop_path_rate, deterministic=not train, rng=rng)
        x = x + shortcut
        return gelu(x)


class MlpLN(nn.Module):
    """LayerNorm → Dense → GELU → Dense (TinyViT-style MLP with leading LN)."""
    hidden_features: int
    out_features: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DropPathModule(nn.Module):
    """Module wrapper over ops.common.drop_path for use inside linen graphs."""
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rng = self.make_rng("drop_path") if (train and self.rate > 0) else None
        return drop_path(x, self.rate, deterministic=not train, rng=rng)
