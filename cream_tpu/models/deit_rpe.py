"""DeiT / ViT with image relative position encodings (iRPE).

TPU-native rebuild of iRPE/DeiT-with-iRPE/rpe_vision_transformer.py: a plain
ViT (patch conv, cls token, learned pos-embed, pre-LN blocks) whose attention
adds iRPE terms exactly as the reference (:75-92):
    attn  = (q*scale) @ k^T
    attn += rpe_k(q)                    # contextual product on keys
    attn += rpe_q(k*scale)^T
    out   = softmax(attn) @ v
    out  += rpe_v(attn)
Registry mirrors rpe_models.py's DeiT-Ti/S/B ctx-product-50 shared k/qk/qkv
variants plus plain deit baselines.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cream_tpu.models.registry import register_model
from cream_tpu.nn.rpe import IRPE
from cream_tpu.ops.common import drop_path
from cream_tpu.ops.rpe import RPEConfig, get_rpe_config
from cream_tpu.nn.act import gelu

Dtype = Any


class RPEAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    rpe_config: RPEConfig | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, height: int, width: int,
                 train: bool = False) -> jnp.ndarray:
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        scale = d ** -0.5
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]          # (B, h, N, d)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        cfg = self.rpe_config
        if cfg is not None and cfg.rpe_k is not None:
            attn = attn + IRPE(d, h, cfg.rpe_k, transposed=True,
                               dtype=self.dtype, name="rpe_k")(q, height, width)
        if cfg is not None and cfg.rpe_q is not None:
            attn = attn + IRPE(d, h, cfg.rpe_q, transposed=True,
                               dtype=self.dtype,
                               name="rpe_q")(k * scale, height, width
                                             ).transpose(0, 1, 3, 2)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        if cfg is not None and cfg.rpe_v is not None:
            out = out + IRPE(d, h, cfg.rpe_v, transposed=False,
                             dtype=self.dtype, name="rpe_v")(attn, height, width)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class RPEBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    rpe_config: RPEConfig | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, height: int, width: int,
                 train: bool = False) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = RPEAttention(self.dim, self.num_heads, self.qkv_bias,
                         self.rpe_config, dtype=self.dtype,
                         name="attn")(h, height, width, train)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        x = x + drop_path(h, self.drop_path_rate, not train, rng)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        return x + drop_path(h, self.drop_path_rate, not train, rng)


class RPEVisionTransformer(nn.Module):
    """Input NHWC. Output logits; with distillation head returns the average
    at eval and the pair in training (DeiT semantics)."""
    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    distilled: bool = False
    rpe_config: RPEConfig | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = x.shape[0]
        p = self.patch_size
        height, width = x.shape[1] // p, x.shape[2] // p
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, height * width, self.embed_dim)

        n_prefix = 2 if self.distilled else 1
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.embed_dim), jnp.float32).astype(self.dtype)
        prefix = [jnp.broadcast_to(cls, (B, 1, self.embed_dim))]
        if self.distilled:
            dist = self.param("dist_token",
                              nn.initializers.truncated_normal(0.02),
                              (1, 1, self.embed_dim), jnp.float32).astype(self.dtype)
            prefix.append(jnp.broadcast_to(dist, (B, 1, self.embed_dim)))
        x = jnp.concatenate(prefix + [x], axis=1)

        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, n_prefix + height * width, self.embed_dim),
                         jnp.float32)
        x = x + pos.astype(self.dtype)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        for i in range(self.depth):
            x = RPEBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         self.qkv_bias, dpr[i], self.rpe_config,
                         dtype=self.dtype, name=f"blocks_{i}")(
                             x, height, width, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="head")(x[:, 0])
        if self.distilled:
            logits_dist = nn.Dense(self.num_classes, dtype=self.dtype,
                                   name="head_dist")(x[:, 1])
            if train:
                return logits, logits_dist
            return (logits + logits_dist) / 2
        return logits


_SIZES = {  # embed_dim, depth, num_heads (DeiT Ti/S/B)
    "tiny": (192, 12, 3), "small": (384, 12, 6), "base": (768, 12, 12),
}


def _register_all():
    for size, (dim, depth, heads) in _SIZES.items():
        def plain(num_classes=1000, dtype=jnp.float32, _d=dim, _dp=depth,
                  _h=heads, **kw):
            return RPEVisionTransformer(num_classes=num_classes, embed_dim=_d,
                                        depth=_dp, num_heads=_h, dtype=dtype, **kw)
        plain.__name__ = f"deit_{size}_patch16_224"
        register_model(plain)

        for on in ("k", "qk", "qkv"):
            def with_rpe(num_classes=1000, dtype=jnp.float32, _d=dim, _dp=depth,
                         _h=heads, _on=on, **kw):
                # ctx-product-50-shared: ratio 1.9, contextual PRODUCT,
                # shared head, skip=1 cls token (rpe_models.py:115-162)
                cfg = get_rpe_config(ratio=1.9, method="product",
                                     mode="ctx", shared_head=True, skip=1,
                                     rpe_on=_on)
                return RPEVisionTransformer(num_classes=num_classes,
                                            embed_dim=_d, depth=_dp,
                                            num_heads=_h, rpe_config=cfg,
                                            dtype=dtype, **kw)
            with_rpe.__name__ = f"deit_{size}_patch16_224_ctx_product_50_shared_{on}"
            register_model(with_rpe)


_register_all()
