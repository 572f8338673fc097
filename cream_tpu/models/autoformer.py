"""AutoFormer — one-shot ViT supernet with weight entanglement.

TPU-native rebuild of AutoFormer/model/supernet_transformer.py (+ the elastic
modules in model/module/). Architectural semantics match the reference's
`--gp --change_qk --relative_position` supernet exactly:
  * pre-LN encoder blocks with elastic embed/heads/mlp-ratio/depth
  * change_qkv: q/k/v width = 64 * sampled_heads, interleaved entanglement
    (qkv_super.py:72-77)
  * learned 2D relative positions on k and v with cls-token row/col 0
    (multihead_super.py:14-65)
  * gp: mean over patch tokens (not cls) for the head

THE TPU DIFFERENCE: the reference re-slices weight views per batch
(supernet_transformer.py:102-127), which would retrace XLA per config. Here a
sampled config is a pytree of int32 scalars/arrays passed INTO one compiled
program; elastic modules mask prefixes instead of slicing (nn/elastic.py), so
supernet training with per-batch random configs compiles exactly once.

For deployment/eval-throughput, `extract_subnet` materializes truly-sliced
weights onto `AutoFormerSubnet` (fixed shapes, full MXU utilization).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.models.registry import register_model
from cream_tpu.nn.elastic import (
    ElasticDense, ElasticLayerNorm, prefix_mask, slice_dense,
    slice_layernorm, slice_qkv_interleaved)
from cream_tpu.ops.common import drop_path
from cream_tpu.nn.act import gelu

Dtype = Any
HEAD_DIM = 64  # change_qkv fixes per-head dim at 64 (supernet_transformer.py:166)


# ---------------------------------------------------------------- search space

@dataclasses.dataclass(frozen=True)
class SearchSpace:
    """Choice lists (experiments/supernet/*.yaml SEARCH_SPACE)."""
    mlp_ratio: tuple = (3.5, 4.0)
    num_heads: tuple = (3, 4)
    depth: tuple = (12, 13, 14)
    embed_dim: tuple = (192, 216, 240)

    @property
    def super_embed_dim(self) -> int:
        return max(self.num_heads) * HEAD_DIM

    @property
    def super_depth(self) -> int:
        return max(self.depth)

    @property
    def super_mlp_ratio(self) -> float:
        return max(self.mlp_ratio)


SPACES = {
    "tiny": SearchSpace(),
    "small": SearchSpace(mlp_ratio=(3.0, 3.5, 4.0), num_heads=(5, 6, 7),
                         depth=(12, 13, 14), embed_dim=(320, 384, 448)),
    "base": SearchSpace(mlp_ratio=(3.0, 3.5, 4.0), num_heads=(9, 10),
                        depth=(14, 15, 16), embed_dim=(528, 576, 624)),
}


def sample_config(rng: np.random.Generator, space: SearchSpace) -> dict:
    """Uniform per-layer sampling (supernet_engine.py:13-24)."""
    depth = int(rng.choice(space.depth))
    return {
        "layer_num": depth,
        "embed_dim": [int(rng.choice(space.embed_dim))] * depth,
        "num_heads": [int(rng.choice(space.num_heads)) for _ in range(depth)],
        "mlp_ratio": [float(rng.choice(space.mlp_ratio)) for _ in range(depth)],
    }


def encode_config(config: dict, space: SearchSpace) -> dict:
    """Reference-style config dict -> fixed-shape int32 pytree for the masked
    supernet (padded to super depth; inactive layers get harmless values)."""
    D = space.super_depth
    depth = config["layer_num"]
    emb = config["embed_dim"][0]
    heads = list(config["num_heads"]) + [max(space.num_heads)] * (D - depth)
    ffn = [int(e * r) for e, r in zip(config["embed_dim"], config["mlp_ratio"])]
    ffn = ffn + [int(emb * max(space.mlp_ratio))] * (D - depth)
    return {
        "embed_dim": jnp.int32(emb),
        "layer_num": jnp.int32(depth),
        "num_heads": jnp.asarray(heads, jnp.int32),
        "ffn_dim": jnp.asarray(ffn, jnp.int32),
    }


def config_param_count(config: dict, num_classes: int = 1000,
                       num_patches: int = 196,
                       max_relative_position: int = 14) -> int:
    """Analytic param count of a subnet — replaces get_sampled_params_numel
    (supernet_transformer.py:129-146) without mutating module state."""
    emb = config["embed_dim"][0]
    n = emb * 3 * 16 * 16 + emb            # patch conv + bias
    n += emb * (2 + num_patches)           # cls + pos (reference counts these)
    rel_table = 2 * (2 * max_relative_position + 2) * HEAD_DIM
    for i in range(config["layer_num"]):
        heads = config["num_heads"][i]
        qd = heads * HEAD_DIM
        ffn = int(emb * config["mlp_ratio"][i])
        n += emb * 3 * qd + 3 * qd         # qkv
        n += qd * emb + emb                # proj
        n += 2 * rel_table                 # rel pos k and v
        n += 2 * 2 * emb                   # two LayerNorms
        n += emb * ffn + ffn + ffn * emb + emb  # fc1, fc2
    n += 2 * emb                           # final norm
    n += emb * num_classes + num_classes   # head
    return n


def config_flops(config: dict, img_size: int = 224, patch_size: int = 16,
                 num_classes: int = 1000) -> int:
    """Analytic MACs of a subnet (get_complexity,
    supernet_transformer.py:142-146) for FLOPs-constrained search."""
    emb = config["embed_dim"][0]
    n_tok = (img_size // patch_size) ** 2 + 1
    macs = (img_size // patch_size) ** 2 * emb * 3 * patch_size ** 2  # patch
    for i in range(config["layer_num"]):
        heads = config["num_heads"][i]
        qd = heads * HEAD_DIM
        ffn = int(emb * config["mlp_ratio"][i])
        macs += n_tok * emb * 3 * qd          # qkv
        macs += n_tok * n_tok * qd * 2        # qk^T + av
        macs += n_tok * qd * emb              # proj
        macs += n_tok * emb * ffn * 2         # fc1 + fc2
    macs += emb * num_classes
    return macs


# ------------------------------------------------------- relative position 2D

@functools.lru_cache(maxsize=None)
def _rel_pos_index(seq_len: int, max_rel: int) -> tuple[np.ndarray, np.ndarray]:
    """(N, N) int index maps for the vertical/horizontal tables, cls row/col 0
    (multihead_super.py:40-59)."""
    length = seq_len - 1
    s = int(length ** 0.5)
    r = np.arange(length)
    dv = r[None, :] // s - r[:, None] // s
    dh = r[None, :] % s - r[:, None] % s
    mv = np.clip(dv, -max_rel, max_rel) + max_rel + 1
    mh = np.clip(dh, -max_rel, max_rel) + max_rel + 1
    mv = np.pad(mv, ((1, 0), (1, 0)))
    mh = np.pad(mh, ((1, 0), (1, 0)))
    return mv.astype(np.int32), mh.astype(np.int32)


class RelativePosition2D(nn.Module):
    """Learned 2D relative-position embeddings (head_dim fixed at 64)."""
    max_relative_position: int = 14
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, seq_len: int) -> jnp.ndarray:
        tdim = 2 * self.max_relative_position + 2
        tv = self.param("embeddings_table_v",
                        nn.initializers.truncated_normal(0.02),
                        (tdim, HEAD_DIM), jnp.float32)
        th = self.param("embeddings_table_h",
                        nn.initializers.truncated_normal(0.02),
                        (tdim, HEAD_DIM), jnp.float32)
        mv, mh = _rel_pos_index(seq_len, self.max_relative_position)
        return (tv[jnp.asarray(mv)] + th[jnp.asarray(mh)]).astype(self.dtype)


# ------------------------------------------------------------- supernet blocks

class ElasticAttention(nn.Module):
    super_heads: int
    rel_pos: bool = True
    max_relative_position: int = 14
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb_active, heads_active, train: bool = False):
        B, N, U = x.shape                    # U == super_embed == heads*64
        H = self.super_heads
        qd_active = heads_active * HEAD_DIM
        scale = HEAD_DIM ** -0.5

        qkv = ElasticDense(U, 3 * U, dtype=self.dtype, name="qkv")(
            x, emb_active, 3 * qd_active)
        # interleaved (q0,k0,v0,q1,...) -> (..., U, 3); unit u is active iff
        # u < 64*heads_active, matching the strided slice qkv_super.py:75
        qkv = qkv.reshape(B, N, U, 3)
        q = qkv[..., 0].reshape(B, N, H, HEAD_DIM).transpose(0, 2, 1, 3)
        k = qkv[..., 1].reshape(B, N, H, HEAD_DIM).transpose(0, 2, 1, 3)
        v = qkv[..., 2].reshape(B, N, H, HEAD_DIM).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        if self.rel_pos:
            rpk = RelativePosition2D(self.max_relative_position,
                                     dtype=self.dtype, name="rel_pos_embed_k")(N)
            attn = attn + jnp.einsum("bhnd,nmd->bhnm", q, rpk,
                                     preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        if self.rel_pos:
            rpv = RelativePosition2D(self.max_relative_position,
                                     dtype=self.dtype, name="rel_pos_embed_v")(N)
            out = out + jnp.einsum("bhnm,nmd->bhnd", attn, rpv,
                                   preferred_element_type=jnp.float32
                                   ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, U)
        # inactive heads carry softmax garbage; proj's input mask removes it
        return ElasticDense(U, U, dtype=self.dtype, name="proj")(
            out, qd_active, emb_active)


class ElasticEncoderLayer(nn.Module):
    super_embed: int
    super_heads: int
    super_ffn: int
    drop_path_rate: float = 0.0
    dropout: float = 0.0
    rel_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb_active, heads_active, ffn_active, is_active,
                 train: bool = False):
        inp = x
        res = x
        h = ElasticLayerNorm(self.super_embed, dtype=self.dtype,
                             name="attn_layer_norm")(x, emb_active)
        h = ElasticAttention(self.super_heads, self.rel_pos,
                             dtype=self.dtype, name="attn")(
                                 h, emb_active, heads_active, train)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        h = drop_path(h, self.drop_path_rate, not train, rng)
        x = res + h

        res = x
        h = ElasticLayerNorm(self.super_embed, dtype=self.dtype,
                             name="ffn_layer_norm")(x, emb_active)
        h = ElasticDense(self.super_embed, self.super_ffn, dtype=self.dtype,
                         name="fc1")(h, emb_active, ffn_active)
        h = gelu(h)
        h = ElasticDense(self.super_ffn, self.super_embed, dtype=self.dtype,
                         name="fc2")(h, ffn_active, emb_active)
        rng = self.make_rng("drop_path") if (train and self.drop_path_rate > 0) else None
        h = drop_path(h, self.drop_path_rate, not train, rng)
        x = res + h
        # identity layer when beyond the sampled depth
        # (supernet_transformer.py:259 skips the block entirely)
        return jnp.where(is_active, x, inp)


class AutoFormerSuper(nn.Module):
    """Input NHWC; call with an encoded config (see encode_config)."""
    space: SearchSpace = SPACES["tiny"]
    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    drop_path_rate: float = 0.1
    gp: bool = True
    abs_pos: bool = True
    rel_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, config: dict, train: bool = False):
        sp = self.space
        U = sp.super_embed_dim
        D = sp.super_depth
        F = int(U * sp.super_mlp_ratio)
        p = self.patch_size
        B = x.shape[0]
        gh, gw = x.shape[1] // p, x.shape[2] // p
        emb = config["embed_dim"]

        x = nn.Conv(U, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, gh * gw, U)
        m_emb = prefix_mask(U, emb, self.dtype)
        x = x * m_emb

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, U), jnp.float32).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls * m_emb, (B, 1, U)), x], axis=1)
        if self.abs_pos:
            pos = self.param("pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, gh * gw + 1, U), jnp.float32)
            x = x + pos.astype(self.dtype) * m_emb

        for i in range(D):
            blk = ElasticEncoderLayer(
                U, max(sp.num_heads), F,
                drop_path_rate=self.drop_path_rate * i / max(D - 1, 1),
                rel_pos=self.rel_pos, dtype=self.dtype, name=f"blocks_{i}")
            is_active = i < config["layer_num"]
            x = blk(x, emb, config["num_heads"][i], config["ffn_dim"][i],
                    is_active, train)

        x = ElasticLayerNorm(U, dtype=self.dtype, name="norm")(x, emb)
        feat = x[:, 1:].mean(axis=1) if self.gp else x[:, 0]
        return ElasticDense(U, self.num_classes, dtype=self.dtype,
                            name="head")(feat, emb, self.num_classes)


# ------------------------------------------------------------- fixed subnet

class AutoFormerSubnet(nn.Module):
    """Plain fixed-shape ViT for deploying an extracted subnet (the RETRAIN
    genotype models, experiments/subnet/AutoFormer-{T,S,B}.yaml)."""
    embed_dim: int
    depth: int
    num_heads: Sequence[int]
    mlp_ratio: Sequence[float]
    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    gp: bool = True
    abs_pos: bool = True
    rel_pos: bool = True
    max_relative_position: int = 14
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        p = self.patch_size
        B = x.shape[0]
        gh, gw = x.shape[1] // p, x.shape[2] // p
        E = self.embed_dim
        x = nn.Conv(E, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, gh * gw, E)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, E), jnp.float32).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, E)), x], axis=1)
        if self.abs_pos:
            pos = self.param("pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, gh * gw + 1, E), jnp.float32)
            x = x + pos.astype(self.dtype)

        N = gh * gw + 1
        for i in range(self.depth):
            heads = self.num_heads[i]
            qd = heads * HEAD_DIM
            ffn = int(E * self.mlp_ratio[i])
            res = x
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"blocks_{i}_attn_layer_norm")(x)
            qkv = nn.Dense(3 * qd, dtype=self.dtype,
                           name=f"blocks_{i}_attn_qkv")(h)
            qkv = qkv.reshape(B, N, 3, heads, HEAD_DIM).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            scale = HEAD_DIM ** -0.5
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * scale
            if self.rel_pos:
                rpk = RelativePosition2D(self.max_relative_position,
                                         dtype=self.dtype,
                                         name=f"blocks_{i}_rel_pos_embed_k")(N)
                attn = attn + jnp.einsum("bhnd,nmd->bhnm", q, rpk,
                                         preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
            if self.rel_pos:
                rpv = RelativePosition2D(self.max_relative_position,
                                         dtype=self.dtype,
                                         name=f"blocks_{i}_rel_pos_embed_v")(N)
                out = out + jnp.einsum("bhnm,nmd->bhnd", attn, rpv,
                                       preferred_element_type=jnp.float32
                                       ).astype(self.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, qd)
            x = res + nn.Dense(E, dtype=self.dtype,
                               name=f"blocks_{i}_attn_proj")(out)

            res = x
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"blocks_{i}_ffn_layer_norm")(x)
            h = nn.Dense(ffn, dtype=self.dtype, name=f"blocks_{i}_fc1")(h)
            h = gelu(h)
            h = nn.Dense(E, dtype=self.dtype, name=f"blocks_{i}_fc2")(h)
            x = res + h

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        feat = x[:, 1:].mean(axis=1) if self.gp else x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="head")(feat)


def extract_subnet(variables: dict, config: dict, space: SearchSpace,
                   num_classes: int = 1000) -> tuple[AutoFormerSubnet, dict]:
    """Materialize truly-sliced weights for a sampled config: the supernet's
    prefix/interleaved entanglement rules (Linear_super.py:71-75,
    qkv_super.py:72-77) applied once, host-side."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    emb = config["embed_dim"][0]
    depth = config["layer_num"]
    out: dict = {}
    out["patch_embed"] = {"kernel": p["patch_embed"]["kernel"][..., :emb],
                          "bias": p["patch_embed"]["bias"][:emb]}
    out["cls_token"] = p["cls_token"][..., :emb]
    if "pos_embed" in p:
        out["pos_embed"] = p["pos_embed"][..., :emb]
    for i in range(depth):
        blk = p[f"blocks_{i}"]
        heads = config["num_heads"][i]
        qd = heads * HEAD_DIM
        ffn = int(emb * config["mlp_ratio"][i])
        out[f"blocks_{i}_attn_layer_norm"] = slice_layernorm(
            blk["attn_layer_norm"], emb)
        out[f"blocks_{i}_attn_qkv"] = slice_qkv_interleaved(
            blk["attn"]["qkv"], emb, 3 * qd)
        out[f"blocks_{i}_attn_proj"] = slice_dense(blk["attn"]["proj"], qd, emb)
        for r in ("rel_pos_embed_k", "rel_pos_embed_v"):
            out[f"blocks_{i}_{r}"] = blk["attn"][r]
        out[f"blocks_{i}_ffn_layer_norm"] = slice_layernorm(
            blk["ffn_layer_norm"], emb)
        out[f"blocks_{i}_fc1"] = slice_dense(blk["fc1"], emb, ffn)
        out[f"blocks_{i}_fc2"] = slice_dense(blk["fc2"], ffn, emb)
    out["norm"] = slice_layernorm(p["norm"], emb)
    out["head"] = slice_dense(p["head"], emb, num_classes)

    model = AutoFormerSubnet(embed_dim=emb, depth=depth,
                             num_heads=tuple(config["num_heads"][:depth]),
                             mlp_ratio=tuple(config["mlp_ratio"][:depth]),
                             num_classes=num_classes)
    return model, {"params": out}


@register_model
def autoformer_supernet_tiny(num_classes: int = 1000, dtype=jnp.float32, **kw):
    return AutoFormerSuper(space=SPACES["tiny"], num_classes=num_classes,
                           dtype=dtype, **kw)


@register_model
def autoformer_supernet_small(num_classes: int = 1000, dtype=jnp.float32, **kw):
    return AutoFormerSuper(space=SPACES["small"], num_classes=num_classes,
                           dtype=dtype, **kw)


@register_model
def autoformer_supernet_base(num_classes: int = 1000, dtype=jnp.float32, **kw):
    return AutoFormerSuper(space=SPACES["base"], num_classes=num_classes,
                           dtype=dtype, **kw)
