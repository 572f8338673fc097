"""ResNet families: CLIP's ModifiedResNet towers + a standard detection
backbone.

TPU-native rebuild of TinyCLIP/src/open_clip/resnet.py (ModifiedResNet:
3-conv stem, anti-aliased avgpool downsampling, attention pooling) and the
torchvision-style ResNet that DETR uses as its frozen-BN backbone
(iRPE/DETR-with-iRPE/models/backbone.py:23-73). NHWC throughout; BatchNorm
runs from stored statistics (`train=False` default) so imported torch
checkpoints evaluate exactly; FrozenBatchNorm is the always-eval variant the
DETR backbone requires.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _bn(dtype, name, train=False):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class FrozenBatchNorm(nn.Module):
    """BN with statistics AND affine frozen as non-trainable constants
    (backbone.py FrozenBatchNorm2d): all four buffers live in the
    'constants' collection so no optimizer ever sees them."""
    features: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = lambda fill: (lambda s: jnp.full(s, fill, jnp.float32))
        scale = self.variable("constants", "scale", init(1.0), (self.features,))
        bias = self.variable("constants", "bias", init(0.0), (self.features,))
        mean = self.variable("constants", "mean", init(0.0), (self.features,))
        var = self.variable("constants", "var", init(1.0), (self.features,))
        w = scale.value * jax.lax.rsqrt(var.value + self.epsilon)
        return (x * w + (bias.value - mean.value * w)).astype(self.dtype)


class CLIPBottleneck(nn.Module):
    """All convs stride 1; stride-2 stages avgpool AFTER conv2 and prepend
    avgpool to the downsample path (resnet.py:7-53)."""
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(_bn(self.dtype, "bn1", train)(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = jax.nn.relu(_bn(self.dtype, "bn2", train)(h))
        if self.stride > 1:
            h = nn.avg_pool(h, (self.stride,) * 2, (self.stride,) * 2)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn(self.dtype, "bn3", train)(h)
        if self.stride > 1 or x.shape[-1] != out_ch:
            x = nn.avg_pool(x, (self.stride,) * 2, (self.stride,) * 2) \
                if self.stride > 1 else x
            x = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="downsample_conv")(x)
            x = _bn(self.dtype, "downsample_bn", train)(x)
        return jax.nn.relu(h + x)


class AttentionPool2d(nn.Module):
    """QKV pooling over mean-prepended tokens (resnet.py:56-93): separate
    q/k/v projections, query = the mean token only."""
    embed_dim: int
    num_heads: int
    output_dim: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        t = jnp.concatenate([t.mean(1, keepdims=True), t], 1)  # (B, HW+1, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(C ** -0.5),
                         (H * W + 1, C), jnp.float32)
        t = t + pos.astype(self.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(t[:, :1])
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(t)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(t)
        h = self.num_heads
        d = C // h
        q = q.reshape(B, 1, h, d).transpose(0, 2, 1, 3) * d ** -0.5
        k = k.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, h, d).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32), -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, C)
        return nn.Dense(self.output_dim or C, dtype=self.dtype,
                        name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """CLIP RN50-style image tower (resnet.py:96-190)."""
    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, normalized: bool = False):
        w = self.width
        for i, ch in enumerate([w // 2, w // 2, w]):
            x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=1, use_bias=False, dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            x = jax.nn.relu(_bn(self.dtype, f"bn{i + 1}", train)(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        for li, (blocks, planes) in enumerate(zip(self.layers,
                                                  [w, w * 2, w * 4, w * 8])):
            for bi in range(blocks):
                x = CLIPBottleneck(planes, stride=(2 if bi == 0 and li > 0
                                                   else 1), dtype=self.dtype,
                                   name=f"layer{li + 1}_{bi}")(x, train)
        x = AttentionPool2d(w * 32, self.heads, self.output_dim,
                            dtype=self.dtype, name="attnpool")(x)
        if normalized:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype,
                                        name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        name="downsample_conv")(x)
            x = FrozenBatchNorm(self.planes, dtype=self.dtype,
                                name="downsample_bn")(x)
        return jax.nn.relu(h + x)


class Bottleneck(nn.Module):
    """torchvision-style 1-3-1 bottleneck with frozen BN (DETR backbone)."""
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype,
                                        name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = jax.nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype,
                                        name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        name="downsample_conv")(x)
            x = FrozenBatchNorm(out_ch, dtype=self.dtype,
                                name="downsample_bn")(x)
        return jax.nn.relu(h + x)


class ResNet(nn.Module):
    """torchvision-layout trunk returning the stride-32 feature map."""
    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"          # 'basic' | 'bottleneck'
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(FrozenBatchNorm(self.width, dtype=self.dtype,
                                        name="bn1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        for li, blocks in enumerate(self.layers):
            planes = self.width * (2 ** li)
            for bi in range(blocks):
                x = cls(planes, stride=(2 if bi == 0 and li > 0 else 1),
                        dtype=self.dtype, name=f"layer{li + 1}_{bi}")(x)
        return x

    @property
    def num_channels(self) -> int:
        mult = 4 if self.block == "bottleneck" else 1
        return self.width * 8 * mult


class ResNetBackbone(nn.Module):
    """DETR backbone adapter: (images NHWC, pixel mask (B,H,W) True=pad) ->
    (stride-32 features, nearest-downsampled mask) (backbone.py:73-95)."""
    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, pixel_mask):
        feat = ResNet(self.layers, self.block, dtype=self.dtype,
                      name="body")(images)
        B, H, W, _ = feat.shape
        mask = jax.image.resize(pixel_mask.astype(jnp.float32), (B, H, W),
                                "nearest") > 0.5
        return feat, mask


def resnet50_backbone(dtype=jnp.float32) -> ResNetBackbone:
    return ResNetBackbone((3, 4, 6, 3), "bottleneck", dtype)


def resnet18_backbone(dtype=jnp.float32) -> ResNetBackbone:
    return ResNetBackbone((2, 2, 2, 2), "basic", dtype)


from cream_tpu.models.registry import register_model  # noqa: E402


class CLIPResNet(nn.Module):
    """Two-tower CLIP with a ModifiedResNet image encoder — the RN50/RN101
    model family (TinyCLIP/src/open_clip/model.py builds ModifiedResNet when
    vision_layers is a list; OpenAI RN checkpoints use QuickGELU text
    towers). Param tree: visual/* (ModifiedResNet), text/* (TextTower),
    logit_scale — importer: zoo/import_torch.py:convert_clip_rn."""
    layers: Sequence[int] = (3, 4, 6, 3)
    embed_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    width: int = 64
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408
    quick_gelu: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        from cream_tpu.models.clip import TextTower
        self.visual = ModifiedResNet(
            layers=self.layers, output_dim=self.embed_dim, heads=self.heads,
            image_size=self.image_size, width=self.width, dtype=self.dtype)
        self.text = TextTower(
            context_length=self.context_length, vocab_size=self.vocab_size,
            width=self.text_width, layers=self.text_layers,
            heads=[self.text_heads] * self.text_layers,
            output_dim=self.embed_dim,
            act="quick_gelu" if self.quick_gelu else "gelu",
            dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(jnp.log(1 / 0.07),
                                                 jnp.float32))

    def encode_image(self, image, normalized: bool = True):
        return self.visual(image, normalized=normalized)

    def encode_text(self, text, normalized: bool = True):
        return self.text(text, normalized=normalized)

    def __call__(self, image, text):
        return (self.encode_image(image), self.encode_text(text),
                jnp.exp(self.logit_scale))


@register_model(name="clip_resnet50")
def clip_resnet50(**kw):
    return CLIPResNet(layers=(3, 4, 6, 3), embed_dim=1024, heads=32, **kw)


@register_model(name="clip_resnet101")
def clip_resnet101(**kw):
    return CLIPResNet(layers=(3, 4, 23, 3), embed_dim=512, heads=32, **kw)


@register_model(name="clip_resnet50_tower")
def clip_resnet50_tower(**kw):
    """OpenAI RN50 CLIP image tower (open_clip RN50 config)."""
    return ModifiedResNet(layers=(3, 4, 6, 3), output_dim=1024, heads=32,
                          image_size=224, width=64, **kw)


@register_model(name="clip_resnet101_tower")
def clip_resnet101_tower(**kw):
    return ModifiedResNet(layers=(3, 4, 23, 3), output_dim=512, heads=32,
                          image_size=224, width=64, **kw)
