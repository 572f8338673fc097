"""Shared Swin-lineage primitives: relative-position-bias window attention,
shifted-window masking, patch merging.

Unifies the Swin blocks duplicated across AutoFormerV2/model/SSS.py:58-283 and
MiniViT/Mini-Swin/models/swin_transformer_minivit.py:60-344. The relative
position index and the shifted-window attention mask are deterministic in
static shapes, so both are host-side numpy constants baked into the jit graph
(no device-side index math, no registered buffers).

NHWC feature maps throughout; (B, H, W, C) in, windows flattened only around
the attention matmuls.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.nn.attention import _on_tpu
from cream_tpu.ops.window import window_partition, window_reverse

Dtype = Any


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(N, N) index into a (2wh-1)*(2ww-1) bias table (SSS.py:84-96)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))           # 2, wh, ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask, 0 within region and -100 across regions
    (SSS.py:201-221)."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    nH, nW_ = H // window, W // window
    wins = img.reshape(nH, window, nW_, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, window * window)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinWindowAttention(nn.Module):
    """Window MHSA with learned relative position bias.

    head_dim=None -> dim//num_heads (Swin/MiniViT); S3 fixes head_dim=32
    (SSS.py:79). Optional proj_l/proj_w callables apply MiniViT's head
    transforms on the attention matrix before/after softmax
    (swin_transformer_minivit.py:128-141).
    """
    dim: int
    window: int
    num_heads: int
    head_dim: Optional[int] = None
    qkv_bias: bool = True
    sow_qkv: bool = False     # expose qkv for MiniViT relation distillation
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None,
                 proj_l=None, proj_w=None, train: bool = False):
        h = self.num_heads
        d = self.head_dim if self.head_dim is not None else x.shape[-1] // h
        scale = d ** -0.5
        N = self.window * self.window

        if x.ndim == 4:
            # spatial (B, Hp, Wp, C) input: fused no-transpose kernel when
            # eligible, else partition internally and fall through.
            B, Hp, Wp, C = x.shape
            # train included: fused_window_attention carries a custom_vjp
            kernel_ok = (proj_l is None and proj_w is None
                         and not self.sow_qkv and _on_tpu()
                         and Hp % self.window == 0 and Wp % self.window == 0
                         and N <= 256 and h * N * N * 4 < 6 * 2 ** 20)
            if kernel_ok:
                from cream_tpu.nn.attention import SplitBiasDense
                from cream_tpu.ops.pallas.window_attention import (
                    fused_window_attention)
                if self.qkv_bias:
                    qkv, qb = SplitBiasDense(3 * h * d, dtype=self.dtype,
                                             name="qkv")(x)
                else:
                    qkv = nn.Dense(3 * h * d, use_bias=False,
                                   dtype=self.dtype, name="qkv")(x)
                    qb = None
                table = self.param("relative_position_bias_table",
                                   nn.initializers.truncated_normal(0.02),
                                   ((2 * self.window - 1) ** 2, h), jnp.float32)
                idx = relative_position_index(self.window, self.window)
                bias = table[jnp.asarray(idx.reshape(-1))].reshape(N, N, h)
                bias = bias.transpose(2, 0, 1)             # (h, N, N)
                m = None if mask is None else jnp.asarray(mask)
                if m is not None:
                    # kernel expects one mask per window position
                    reps = (Hp // self.window) * (Wp // self.window) // m.shape[0]
                    if reps > 1:
                        m = jnp.tile(m, (reps, 1, 1))
                out = fused_window_attention(qkv, bias, m, window=self.window,
                                             heads=h, kd=d, dv=d,
                                             layout="qkv_major", qkv_bias=qb)
                return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
            wx, padded = window_partition(x, self.window)
            out = self.__call__(wx, mask=mask, proj_l=proj_l, proj_w=proj_w,
                                train=train)
            return window_reverse(out, self.window, padded, (Hp, Wp))

        Bn, N, C = x.shape
        qkv = nn.Dense(3 * h * d, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, h, d).transpose(2, 0, 3, 1, 4)
        if self.sow_qkv:
            # (3, B_windows, heads, N, d) for cal_relation_loss
            # (MiniViT/Mini-Swin/models/swin_transformer_minivit_distill.py:291-300)
            self.sow("intermediates", "qkv_states", qkv)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)

        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.window - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window, self.window)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(N, N, h)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if proj_l is not None:
            attn = proj_l(attn.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + \
                jnp.asarray(mask)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        if proj_w is not None:
            attn = proj_w(attn.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        attn = attn.astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, h * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def swin_attend(x, attn_mod, window: int, shift: int, mask_hw=None,
                proj_l=None, proj_w=None, train: bool = False):
    """Roll-(window-attend)-unroll for one (shifted) window attention pass.
    x: (B, H, W, C). The shift mask is a host-side constant per (H, W).
    Windowing happens inside attn_mod (fused Pallas kernel on the inference
    path; jnp partition otherwise)."""
    B, H, W, C = x.shape
    window = min(window, H, W)
    shift = 0 if window >= min(H, W) else shift
    # Pad to a window multiple BEFORE rolling/masking (the reference pads
    # first — Swin/SSS F.pad then roll — so at non-divisible resolutions the
    # shift mask is computed on the padded grid, not the raw one).
    Hp, Wp = -(-H // window) * window, -(-W // window) * window
    if (Hp, Wp) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    if shift > 0:
        x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        mask = shifted_window_mask(Hp, Wp, window, shift)
    else:
        mask = None
    x = attn_mod(x, mask=mask, proj_l=proj_l, proj_w=proj_w, train=train)
    if shift > 0:
        x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
    if (Hp, Wp) != (H, W):
        x = x[:, :H, :W]
    return x


class SwinPatchMerging(nn.Module):
    """Concat 2x2 neighbors -> LN -> Linear(4C -> out_dim) (SSS.py:284-322)."""
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # order [x0;x1;x2;x3] = [(0,0),(1,0),(0,1),(1,1)] (SSS.py:311-314)
        x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                             x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinPatchEmbed(nn.Module):
    """4x4 conv patchify + LN (standard Swin)."""
    embed_dim: int
    patch_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
