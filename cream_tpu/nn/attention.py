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
import jax
import jax.numpy as jnp

from cream_tpu.ops.common import attention_bias_indices


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu",) or \
            "TPU" in str(jax.devices()[0])
    except Exception:
        return False


class SplitBiasDense(nn.Module):
    """Dense whose bias is returned instead of added — the param tree
    (kernel + bias, same shapes/init as nn.Dense) stays checkpoint-identical
    while the bias add moves into the fused attention kernel (one less HBM
    pass over the qkv tensor; see fused_window_attention qkv_bias)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = jax.lax.dot_general(x, kernel.astype(self.dtype),
                                (((x.ndim - 1,), (0,)), ((), ())))
        return y, bias


class BiasAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float = 4.0
    resolution: tuple[int, int] = (7, 7)
    use_pallas: bool = True        # fused kernel on the inference path
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
        bias_tab = biases[:, idxs]                         # (h, N, N)

        from cream_tpu.ops.pallas.bias_attention import (
            fused_bias_attention, supports_shape)
        if self.use_pallas and not train and supports_shape(N) and _on_tpu():
            # fused kernel: the (B, h, N, N) attention matrix never leaves VMEM
            out = fused_bias_attention(q.transpose(0, 2, 1, 3),
                                       k.transpose(0, 2, 1, 3),
                                       v.transpose(0, 2, 1, 3), bias_tab)
            out = out.transpose(0, 2, 1, 3)                # (B, N, h, d)
        else:
            attn = jnp.einsum("bnhk,bmhk->bhnm", q, k,
                              preferred_element_type=jnp.float32) * (kd ** -0.5)
            attn = attn + bias_tab[None].astype(attn.dtype)
            attn = nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(B, N, h * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class WindowBiasAttention(nn.Module):
    """Bias-attention over non-overlapping windows of an NHWC feature map.

    Same math and parameter tree as BiasAttention applied per window
    (TinyViT/models/tiny_vit.py:216-286 + its window partitioning :344-370),
    but structured TPU-first: LN and the fused qkv projection run on the
    (B, H, W, C) map (per-token ops — windowing commutes with them), and the
    windowing itself happens inside the fused Pallas kernel via BlockSpec
    index maps. Nothing is ever transposed in HBM. Measured on v5e bs256
    (TinyViT-21M stage shapes, random data): 7.8 ms vs 10.9-13 ms for the
    einsum-over-partitioned-windows form whose reshape/transpose chain poisons
    XLA's layout assignment (batch-minor convolutions + T(4,128) copies).

    The jnp path (training / CPU / shapes the kernel doesn't support) keeps
    the reference op order: partition first, then LN inside the window stack —
    identical results when H, W divide the window (all shipped configs).
    """
    dim: int
    key_dim: int
    num_heads: int
    window: int
    attn_ratio: float = 1.0
    use_pallas: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from cream_tpu.ops.window import window_partition, window_reverse
        B, H, W, C = x.shape
        h, kd = self.num_heads, self.key_dim
        d = int(self.attn_ratio * kd)
        ws = min(self.window, H, W)
        N = ws * ws
        idxs, num_offsets = attention_bias_indices((ws, ws))
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (h, num_offsets), jnp.float32)
        bias_tab = biases[:, idxs]                        # (h, N, N)

        # kernel path: divisible windows, on TPU, VMEM-sized bias. Training
        # uses it too — the custom_vjp bwd kernel keeps the no-transpose
        # layout through the whole train graph (round-2 measurement: the
        # einsum fallback's window_partition poisons XLA layout assignment,
        # 11-13 ms/block vs ~2 intrinsic).
        kernel_ok = (self.use_pallas and _on_tpu()
                     and H % ws == 0 and W % ws == 0 and N <= 256
                     and h * N * N * 4 < 6 * 2 ** 20)
        if kernel_ok:
            from cream_tpu.ops.pallas.window_attention import (
                fused_window_attention)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
            qkv, qb = SplitBiasDense(h * (2 * kd + d), dtype=self.dtype,
                                     name="qkv")(y)
            out = fused_window_attention(qkv, bias_tab, window=ws, heads=h,
                                         kd=kd, dv=d,
                                         qkv_bias=qb)     # (B, H, W, h*d)
        else:
            w, padded = window_partition(x, ws)
            Wn = w.shape[0]
            w = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(w)
            qkv = nn.Dense(h * (2 * kd + d), dtype=self.dtype, name="qkv")(w)
            qkv = qkv.reshape(Wn, N, h, 2 * kd + d)
            q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
            attn = jnp.einsum("bnhk,bmhk->bhnm", q, k,
                              preferred_element_type=jnp.float32) * (kd ** -0.5)
            attn = attn + bias_tab[None].astype(attn.dtype)
            attn = nn.softmax(attn, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Wn, N, h * d)
            out = window_reverse(o, ws, padded, (H, W))
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
