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
# per-stage default (kernel, expand) from the choice_block_pool strings
# (Cream/tools/test.py:81-86): ir_r1_k3_s2_e4_c24, k5_e4_c40, k3_e6_c80,
# k3_e6_c96, k5_e6_c192
STAGE_DEFAULTS = ((3, 4), (5, 4), (3, 6), (3, 6), (5, 6))


def swish(x):
    return x * jax.nn.sigmoid(x)


def hard_sigmoid(x):
    """timm hard_sigmoid: relu6(x + 3) / 6 — the SE gate the reference
    builds with se_kwargs(gate_fn=hard_sigmoid) (supernet.py:176-180)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None
                   ) -> int:
    """timm make_divisible — SE reduced channels round to a multiple of 8."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SqueezeExcite(nn.Module):
    """timm-exact EfficientNet SE as the reference configures it: reduced
    channels = make_divisible(mid_chs * 0.25, 8) (reduce_mid=True, divisor=8),
    ReLU inner act, hard-sigmoid gate (supernet.py se_kwargs)."""
    reduce_chs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduce_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_expand")(s)
        return x * hard_sigmoid(s)


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
        x = SqueezeExcite(make_divisible(mid * self.se_ratio),
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
        x = SqueezeExcite(make_divisible(in_chs * 0.25), dtype=self.dtype,
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
        # tail is ConvBnAct 'cn_r1_k1_s1_c320' (supernet.py arch_def stage 6)
        x = ConvBN(320, 1, dtype=self.dtype, name="blocks_tail")(x, train)
        x = swish(x)
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
    childnet.py): the supernet body with exactly one op per layer.

    `arch` is per-stage: a tuple of tuples of choice ids, one inner tuple per
    searchable stage with one id per KEPT layer (variable depth, like the
    released Cream_14..604 arch_lists in Cream/tools/test.py:52-76 minus
    their [0] stem/tail sentinels). Layer i>0 always runs at stride 1
    (build_childnet.py:126-127).

    `released_quirk`: the reference's gen_childnet skips choice substitution
    for single-block stages (`if len(layer_arch) == 1: ... continue`,
    childnet.py:113-117) — meant for the [0] stem/tail sentinels, it also
    hits real one-layer stages, so released checkpoints keep the
    choice_block_pool default kernel/expansion there. True for released-ckpt
    models; False for supernet extraction (which honors the sampled op)."""
    arch: tuple                      # ((op, ...) per stage)
    num_classes: int = 1000
    stem_chs: int = 16
    num_features: int = 1280
    stages: Sequence = SEARCH_STAGES
    released_quirk: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, *, pyramid: bool = False):
        x = ConvBN(self.stem_chs, 3, 2, 1, dtype=self.dtype, name="conv_stem")(x, train)
        x = swish(x)
        x = DepthwiseSeparable(16, dtype=self.dtype, name="blocks_0")(x, train)
        feats = []
        for s, (chs, _, stride) in enumerate(self.stages):
            single = len(self.arch[s]) == 1 and self.released_quirk
            for i, op in enumerate(self.arch[s]):
                k, e = STAGE_DEFAULTS[s] if single else CHOICES[op]
                x = InvertedResidual(chs, k, e, stride if i == 0 else 1,
                                     dtype=self.dtype,
                                     name=f"stage_{s}_layer_{i}")(x, train)
            if s in (1, 3):          # stride-8 and stride-16 stage ends
                feats.append(x)
        x = ConvBN(320, 1, dtype=self.dtype, name="blocks_tail")(x, train)
        x = swish(x)
        if pyramid:
            return (*feats, x)       # strides (8, 16, 32)
        x = x.mean(axis=(1, 2), keepdims=True)
        x = nn.Conv(self.num_features, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_head")(x)
        x = swish(x).reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)

    def forward_pyramid(self, x, train: bool = False) -> tuple:
        """C3/C4/C5 features (strides 8/16/32) — the detection-backbone
        contract the reference's CDARTS_detection provides for NAS-found
        mobile backbones (mmdet/models/backbones/, e.g. fbnet.py /
        mobilenetv3.py return per-stride stage features into FPN)."""
        return self(x, train, pyramid=True)


def nest_arch(arch, stages=SEARCH_STAGES) -> tuple:
    """Flat per-layer op ids (-1 = skipped, supernet layout) -> per-stage
    tuples of kept choice ids (childnet layout)."""
    import numpy as np
    flat = [int(a) for a in np.asarray(arch).ravel()]
    out, li = [], 0
    for _, depth, _ in stages:
        out.append(tuple(a for a in flat[li:li + depth] if a >= 0))
        li += depth
    return tuple(out)


def extract_childnet(variables: dict, arch, num_classes: int = 1000,
                     stages=SEARCH_STAGES, dtype=jnp.float32
                     ) -> tuple[CreamChildNet, dict]:
    """Copy the chosen choice's parameters out of a trained supernet into a
    fixed CreamChildNet (physically drops the other five choices per layer).
    `arch` is the flat supernet form (-1 = skipped); kept layers re-index
    densely in the childnet."""
    import numpy as np

    flat = [int(a) for a in np.asarray(arch).ravel()]
    # supernet layer index -> (stage, dense childnet index) for kept layers
    remap: dict[tuple[int, int], int] = {}
    li = 0
    for s, (_, depth, _) in enumerate(stages):
        dense = 0
        for i in range(depth):
            if flat[li] >= 0:
                remap[(s, i)] = dense
                dense += 1
            li += 1

    def take(tree):
        out_p, out_s = {}, {}
        for coll, dst in (("params", out_p), ("batch_stats", out_s)):
            src = tree.get(coll, {})
            for key, sub in src.items():
                if key.startswith("stage_"):
                    _, s, _, i = key.split("_")
                    li = sum(d for _, d, _ in stages[:int(s)]) + int(i)
                    if flat[li] < 0:
                        continue
                    dense = remap[(int(s), int(i))]
                    dst[f"stage_{s}_layer_{dense}"] = sub[f"choice_{flat[li]}"]
                else:
                    dst[key] = sub
        return {"params": out_p, "batch_stats": out_s}

    model = CreamChildNet(arch=nest_arch(flat, stages),
                          num_classes=num_classes, stages=stages, dtype=dtype)
    return model, take(variables)


@register_model
def cream_supernet(num_classes: int = 1000, dtype=jnp.float32, **kw):
    return CreamSupernet(num_classes=num_classes, dtype=dtype, **kw)


@register_model
def cream_childnet(arch, num_classes: int = 1000, dtype=jnp.float32, **kw):
    """`arch`: per-stage tuples of choice ids, or the flat -1-padded
    supernet form (converted via nest_arch)."""
    arch = tuple(arch)
    if arch and not isinstance(arch[0], (tuple, list)):
        arch = nest_arch(arch, kw.get("stages", SEARCH_STAGES))
    arch = tuple(tuple(s) for s in arch)
    return CreamChildNet(arch=arch, num_classes=num_classes,
                         dtype=dtype, **kw)


# released-checkpoint genotypes (Cream/tools/test.py:52-76, stem/tail [0]
# sentinels dropped; values index CHOICES = kernel{3,5,7} x expand{4,6})
RELEASED_CHILDNETS = {
    "cream_14": ((3,), (3, 3), (3, 3), (3,), (3,)),
    "cream_43": ((3,), (3, 1), (3, 1), (3, 3, 3), (3, 3)),
    "cream_114": ((3,), (3, 3), (3, 3), (3, 3, 3), (3, 3)),
    "cream_287": ((3,), (3, 3), (3, 1, 3), (3, 3, 3, 3), (3, 3, 3)),
    "cream_481": ((3, 4, 3, 1), (3, 2, 3, 0), (3, 3, 3, 1, 1), (3, 3, 3, 3),
                  (3, 3, 3, 3)),
    "cream_604": ((3, 3, 2, 3, 3), (3, 2, 3, 2, 3), (3, 2, 3, 2, 3),
                  (3, 3, 2, 2, 3, 3), (3, 3, 2, 3, 3, 3)),
}
# eval resolutions per released model (test.py sets DATASET.IMAGE_SIZE)
RELEASED_CHILDNET_IMG_SIZE = {
    "cream_14": 64, "cream_43": 96, "cream_114": 160,
    "cream_287": 224, "cream_481": 224, "cream_604": 224,
}


def _make_released_factory(name, arch):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kw):
        return CreamChildNet(arch=arch, num_classes=num_classes, dtype=dtype,
                             released_quirk=True, **kw)
    factory.__name__ = name
    return factory


for _name, _arch in RELEASED_CHILDNETS.items():
    register_model(_make_released_factory(_name, _arch))
