"""Mini-DeiT — weight-multiplexed DeiT with iRPE (MiniViT).

Rebuild of MiniViT/Mini-DeiT/mini_vision_transformer.py: each physical block
runs its shared qkv/proj/MLP weights `repeated_times` times (mini_deit_models
use 2); per-repeat diversity comes from separate LayerNorms, separate
contextual-product iRPE-on-keys tables, per-repeat 1x1 head transforms
conv_l/conv_w around softmax (:78-112), and per-repeat drop-path rates.
Mini-DeiT drops the cls token (use_cls_token=False, skip=0 RPE) and mean-pools
tokens for the head.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cream_tpu.models.registry import register_model
from cream_tpu.nn.rpe import IRPE
from cream_tpu.ops.common import drop_path
from cream_tpu.ops.rpe import get_rpe_config
from cream_tpu.nn.act import gelu

Dtype = Any


def _mini_deit_rpe():
    # mini_deit_models.py:9-19
    return get_rpe_config(ratio=1.9, method="product", mode="ctx",
                          shared_head=True, skip=0, rpe_on="k")


class MiniDeiTBlock(nn.Module):
    """Shared attention/MLP run `repeats` times with per-repeat extras."""
    dim: int
    num_heads: int
    repeats: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rates: Sequence[float] = (0.0, 0.0)
    use_transform: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, height: int, width: int, train: bool = False):
        C = self.dim
        h = self.num_heads
        d = C // h
        scale = d ** -0.5
        # shared weights
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")
        proj = nn.Dense(C, dtype=self.dtype, name="proj")
        fc1 = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")
        fc2 = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")
        rpe_cfg = _mini_deit_rpe().rpe_k

        for r in range(self.repeats):
            B, N, _ = x.shape
            res = x
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm1_{r}")(x)
            q_, k_, v_ = jnp.split(qkv(t).reshape(B, N, 3, h, d)
                                   .transpose(2, 0, 3, 1, 4), 3, axis=0)
            q_, k_, v_ = q_[0] * scale, k_[0], v_[0]
            attn = jnp.einsum("bhnd,bhmd->bhnm", q_, k_,
                              preferred_element_type=jnp.float32)
            attn = attn + IRPE(d, h, rpe_cfg, transposed=True,
                               dtype=self.dtype,
                               name=f"rpe_k_{r}")(q_, height, width)
            if self.use_transform:
                # 1x1 conv over the head axis == Dense on heads, no bias
                attn = nn.Dense(h, use_bias=False, dtype=self.dtype,
                                name=f"conv_l_{r}")(
                                    attn.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            if self.use_transform:
                attn = nn.Dense(h, use_bias=False, dtype=self.dtype,
                                name=f"conv_w_{r}")(
                                    attn.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v_,
                             preferred_element_type=jnp.float32).astype(self.dtype)
            out = proj(out.transpose(0, 2, 1, 3).reshape(B, N, C))
            dpr = self.drop_path_rates[r]
            rng = self.make_rng("drop_path") if (train and dpr > 0) else None
            x = res + drop_path(out, dpr, not train, rng)

            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm2_{r}")(x)
            t = fc2(gelu(fc1(t)))
            rng = self.make_rng("drop_path") if (train and dpr > 0) else None
            x = x + drop_path(t, dpr, not train, rng)
        return x


class MiniDeiT(nn.Module):
    num_classes: int = 1000
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    repeated_times: int = 2
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    use_transform: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        p = self.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, gh * gw, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, gh * gw, self.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        n_blocks = self.depth // self.repeated_times
        for i in range(n_blocks):
            rates = tuple(dpr[i * self.repeated_times:(i + 1) * self.repeated_times])
            x = MiniDeiTBlock(self.embed_dim, self.num_heads,
                              self.repeated_times, self.mlp_ratio,
                              drop_path_rates=rates,
                              use_transform=self.use_transform,
                              dtype=self.dtype, name=f"blocks_{i}")(
                                  x, gh, gw, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x.mean(axis=1)                     # no cls token: avg pool
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


_SIZES = {"tiny": (192, 3), "small": (384, 6), "base": (768, 12)}

for _n, (_dim, _heads) in _SIZES.items():
    def _f(num_classes=1000, dtype=jnp.float32, _a=(_dim, _heads), **kw):
        d, h = _a
        return MiniDeiT(num_classes=num_classes, embed_dim=d, num_heads=h,
                        dtype=dtype, **kw)
    _f.__name__ = f"mini_deit_{_n}_patch16_224"
    register_model(_f)
