"""Cream — MBConv one-shot supernet with per-layer operator choice.

Rebuild of Cream/lib/models/structures/supernet.py (+ builders/build_supernet.py):
EfficientNet-style stem, a fixed depthwise-separable first stage, five
searchable stages whose every layer picks one of SIX InvertedResidual choices
(kernel {3,5,7} x expand {4,6}, SE 0.25, Swish — supernet.py:156-187), a fixed
320-channel conv block, 1280 conv head, classifier. `forward(x, architecture)`
routes per-layer (supernet.py:105-126); arch entry -1 skips the layer.

TPU design: the architecture is a traced int array and per-layer routing is
lax.switch over the six parameter sets — ONE compiled program serves every
sampled path (the reference re-dispatches Python per batch). A skipped layer
is lax.cond against identity. The meta-matching 2-layer head
(forward_meta, supernet.py:127) is a separate flax module.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cream_tpu.models.registry import register_model
from cream_tpu.nn.layers import ConvBN

Dtype = Any

# (channels, num_layers, stride) for the five searchable stages; defaults are
# the sta_num=(4,4,4,4,4) FLOPs-window sizing (Cream/lib/utils/
# search_structure_supernet.py:6-44 with the 600M default window)
SEARCH_STAGES = ((24, 4, 2), (40, 4, 2), (80, 4, 2), (96, 4, 1), (192, 4, 2))
CHOICES = tuple((k, e) for k in (3, 5, 7) for e in (4, 6))  # 6 per layer


def swish(x):
    return x * jax.nn.sigmoid(x)


class SqueezeExciteSwish(nn.Module):
    """EfficientNet SE: reduce ratio 0.25 of the block INPUT channels."""
    reduce_chs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduce_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_reduce")(s)
        s = swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class InvertedResidual(nn.Module):
    """MBConv: expand 1x1 -> dw kxk -> SE -> project 1x1, Swish activations."""
    out_chs: int
    kernel: int
    expand: int
    stride: int = 1
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        mid = in_chs * self.expand
        shortcut = x
        x = ConvBN(mid, 1, dtype=self.dtype, name="conv_pw")(x, train)
        x = swish(x)
        x = ConvBN(mid, self.kernel, self.stride, self.kernel // 2, groups=mid,
                   dtype=self.dtype, name="conv_dw")(x, train)
        x = swish(x)
        x = SqueezeExciteSwish(max(1, int(in_chs * self.se_ratio)),
                               dtype=self.dtype, name="se")(x)
        x = ConvBN(self.out_chs, 1, dtype=self.dtype, name="conv_pwl")(x, train)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class DepthwiseSeparable(nn.Module):
    """The fixed 'ds' first stage: dw 3x3 -> SE -> pw 1x1."""
    out_chs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        shortcut = x
        x = ConvBN(in_chs, 3, 1, 1, groups=in_chs, dtype=self.dtype,
                   name="conv_dw")(x, train)
        x = swish(x)
        x = SqueezeExciteSwish(max(1, int(in_chs * 0.25)), dtype=self.dtype,
                               name="se")(x)
        x = ConvBN(self.out_chs, 1, dtype=self.dtype, name="conv_pw")(x, train)
        if in_chs == self.out_chs:
            x = x + shortcut
        return x


class ChoiceLayer(nn.Module):
    """Six InvertedResidual choices; `op` (traced int) picks via lax.switch;
    op == -1 skips (identity), only legal for stride-1 same-width layers."""
    out_chs: int
    stride: int
    skippable: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, op, train: bool = False):
        # All six choices are computed and one is selected. With a traced
        # `op` this costs 6x FLOPs but compiles ONCE for every sampled path
        # (lifted lax.switch can't host per-branch parameter sets); with a
        # concrete `op` (subnet eval/deploy) XLA constant-folds the select and
        # dead-code-eliminates the other five branches.
        outs = [InvertedResidual(self.out_chs, k, e, self.stride,
                                 dtype=self.dtype, name=f"choice_{i}")(x, train)
                for i, (k, e) in enumerate(CHOICES)]
        stacked = jnp.stack(outs)                        # (6, B, H, W, C)
        picked = stacked[jnp.clip(op, 0, len(CHOICES) - 1)]
        if self.skippable:
            return jnp.where(op >= 0, picked, x)
        return picked


class CreamSupernet(nn.Module):
    num_classes: int = 1000
    stem_chs: int = 16
    num_features: int = 1280
    stages: Sequence = SEARCH_STAGES
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, architecture, train: bool = False):
        """architecture: int array (num_searchable_layers,) of op ids; -1
        skips (never the first layer of a stage)."""
        x = ConvBN(self.stem_chs, 3, 2, 1, dtype=self.dtype, name="conv_stem")(x, train)
        x = swish(x)
        x = DepthwiseSeparable(16, dtype=self.dtype, name="blocks_0")(x, train)
        li = 0
        for s, (chs, depth, stride) in enumerate(self.stages):
            for i in range(depth):
                x = ChoiceLayer(chs, stride if i == 0 else 1,
                                skippable=(i > 0), dtype=self.dtype,
                                name=f"stage_{s}_layer_{i}")(
                                    x, architecture[li], train)
                li += 1
        x = InvertedResidual(320, 1, 6, 1, dtype=self.dtype,
                             name="blocks_tail")(x, train)
        x = x.mean(axis=(1, 2), keepdims=True)
        x = nn.Conv(self.num_features, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_head")(x)
        x = swish(x).reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)

    @property
    def num_search_layers(self) -> int:
        return sum(d for _, d, _ in self.stages)


class MetaMatchingHead(nn.Module):
    """2-layer meta net scoring (student-teacher) logit differences
    (forward_meta, Cream/lib/models/structures/supernet.py:127)."""
    hidden: int = 256

    @nn.compact
    def __call__(self, logit_diff: jnp.ndarray) -> jnp.ndarray:
        x = logit_diff.reshape(1, -1)
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(1, name="fc2")(x).reshape(())


class CreamChildNet(nn.Module):
    """Fixed-genotype retrain/deploy model (Cream/lib/models/structures/
    childnet.py): the supernet body with exactly one op per layer."""
    arch: tuple                      # per-layer op ids, -1 = skipped
    num_classes: int = 1000
    stem_chs: int = 16
    num_features: int = 1280
    stages: Sequence = SEARCH_STAGES
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.stem_chs, 3, 2, 1, dtype=self.dtype, name="conv_stem")(x, train)
        x = swish(x)
        x = DepthwiseSeparable(16, dtype=self.dtype, name="blocks_0")(x, train)
        li = 0
        for s, (chs, depth, stride) in enumerate(self.stages):
            for i in range(depth):
                op = self.arch[li]
                if op >= 0:
                    k, e = CHOICES[op]
                    x = InvertedResidual(chs, k, e, stride if i == 0 else 1,
                                         dtype=self.dtype,
                                         name=f"stage_{s}_layer_{i}")(x, train)
                li += 1
        x = InvertedResidual(320, 1, 6, 1, dtype=self.dtype,
                             name="blocks_tail")(x, train)
        x = x.mean(axis=(1, 2), keepdims=True)
        x = nn.Conv(self.num_features, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_head")(x)
        x = swish(x).reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


def extract_childnet(variables: dict, arch, num_classes: int = 1000,
                     stages=SEARCH_STAGES, dtype=jnp.float32
                     ) -> tuple[CreamChildNet, dict]:
    """Copy the chosen choice's parameters out of a trained supernet into a
    fixed CreamChildNet (physically drops the other five choices per layer)."""
    import numpy as np

    arch = [int(a) for a in np.asarray(arch).ravel()]

    def take(tree):
        out_p, out_s = {}, {}
        for coll, dst in (("params", out_p), ("batch_stats", out_s)):
            src = tree.get(coll, {})
            for key, sub in src.items():
                if key.startswith("stage_"):
                    _, s, _, i = key.split("_")
                    li = sum(d for _, d, _ in stages[:int(s)]) + int(i)
                    if arch[li] < 0:
                        continue
                    dst[key] = sub[f"choice_{arch[li]}"]
                else:
                    dst[key] = sub
        return {"params": out_p, "batch_stats": out_s}

    model = CreamChildNet(arch=tuple(arch), num_classes=num_classes,
                          stages=stages, dtype=dtype)
    return model, take(variables)


@register_model
def cream_supernet(num_classes: int = 1000, dtype=jnp.float32, **kw):
    return CreamSupernet(num_classes=num_classes, dtype=dtype, **kw)


@register_model
def cream_childnet(arch, num_classes: int = 1000, dtype=jnp.float32, **kw):
    return CreamChildNet(arch=tuple(arch), num_classes=num_classes,
                         dtype=dtype, **kw)
