"""Mixup / CutMix, seeded and jit-able.

Equivalent of the timm Mixup every reference trainer uses (batch mode: one
lambda per batch, mixing with the flipped batch), including TinyViT's
seed-deterministic variant (main.py:310-311 passes per-batch seeds so saved
teacher logits stay aligned) — here determinism is inherent: the rng key is
an explicit argument.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _beta(rng, alpha: float) -> jnp.ndarray:
    a = jax.random.gamma(rng, alpha)
    b = jax.random.gamma(jax.random.fold_in(rng, 1), alpha)
    return a / (a + b)


def _cutmix_box(rng, H: int, W: int, lam: jnp.ndarray):
    """Random box with area ratio (1-lam); returns mask (H, W) of the box."""
    cut = jnp.sqrt(1.0 - lam)
    ch, cw = (cut * H).astype(jnp.int32), (cut * W).astype(jnp.int32)
    ry = jax.random.randint(rng, (), 0, H)
    rx = jax.random.randint(jax.random.fold_in(rng, 1), (), 0, W)
    y0 = jnp.clip(ry - ch // 2, 0, H)
    y1 = jnp.clip(ry + ch // 2, 0, H)
    x0 = jnp.clip(rx - cw // 2, 0, W)
    x1 = jnp.clip(rx + cw // 2, 0, W)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    mask = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))
    # corrected lambda from actual box area
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (H * W)
    return mask, lam_adj


def mixup_cutmix(rng: jax.Array, images: jnp.ndarray, labels: jnp.ndarray,
                 num_classes: int, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, switch_prob: float = 0.5,
                 smoothing: float = 0.1):
    """Returns (mixed_images NHWC, soft_targets (B, num_classes)).

    Batch mode: one lambda, partner = flipped batch. If labels are already
    soft (B, C) they are mixed directly (used by the distillation pipeline).
    """
    B, H, W, _ = images.shape
    r_switch, r_lam, r_box = jax.random.split(rng, 3)
    # When only one mode is enabled, always use it (timm semantics) — the
    # disabled branch would otherwise yield lam=1 (no augmentation at all)
    # for ~switch_prob of batches.
    if cutmix_alpha <= 0:
        use_cutmix = jnp.bool_(False)
    elif mixup_alpha <= 0:
        use_cutmix = jnp.bool_(True)
    else:
        use_cutmix = jax.random.bernoulli(r_switch, switch_prob)

    lam_mix = _beta(r_lam, mixup_alpha) if mixup_alpha > 0 else jnp.float32(1.0)
    lam_cut = _beta(r_lam, cutmix_alpha) if cutmix_alpha > 0 else jnp.float32(1.0)

    flipped = images[::-1]

    # mixup branch
    mix_imgs = images * lam_mix + flipped * (1.0 - lam_mix)
    # cutmix branch
    mask, lam_cut_adj = _cutmix_box(r_box, H, W, lam_cut)
    cut_imgs = jnp.where(mask[None, :, :, None], flipped, images)

    imgs = jnp.where(use_cutmix, cut_imgs, mix_imgs)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)

    if labels.ndim == 1:
        off = smoothing / num_classes
        on = 1.0 - smoothing + off
        y = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    else:
        y = labels
    targets = y * lam + y[::-1] * (1.0 - lam)
    return imgs, targets


def seeded_pair_mixup(seeds: jnp.ndarray, images: jnp.ndarray,
                      labels: jnp.ndarray, num_classes: int,
                      mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                      switch_prob: float = 0.5, smoothing: float = 0.1):
    """Seed-deterministic pair mixup — the reference's `pair2` mode
    (TinyViT/data/augmentation/mixup.py:213-235), used by BOTH save_logits
    and the distill train loop so teacher and student see identical pixels
    (TinyViT/main.py:310-311, save_logits.py:120-121).

    Each consecutive pair (2i, 2i+1) is mixed with its partner using
    (lam, use_cutmix) drawn from a key derived from seeds[2i] ^ seeds[2i+1].
    Pure function of (seeds, images, labels): replaying the same per-sample
    aug seeds reproduces the exact mix on any host.
    """
    B, H, W, _ = images.shape
    assert B % 2 == 0, "pair mixup needs an even batch"
    pair_seed = (seeds[0::2] ^ seeds[1::2]).astype(jnp.uint32)
    keys = jax.vmap(jax.random.key)(pair_seed)                  # (B/2,)

    def pair_params(key):
        r_switch, r_lam, r_box = jax.random.split(key, 3)
        lam_mix = (_beta(r_lam, mixup_alpha) if mixup_alpha > 0
                   else jnp.float32(1.0))
        lam_cut = (_beta(r_lam, cutmix_alpha) if cutmix_alpha > 0
                   else jnp.float32(1.0))
        if cutmix_alpha <= 0:
            use_cutmix = jnp.bool_(False)
        elif mixup_alpha <= 0:
            use_cutmix = jnp.bool_(True)
        else:
            use_cutmix = jax.random.bernoulli(r_switch, switch_prob)
        mask, lam_cut_adj = _cutmix_box(r_box, H, W, lam_cut)
        lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
        return use_cutmix, lam, mask

    use_cutmix, lam, mask = jax.vmap(pair_params)(keys)         # (B/2, ...)

    pairs = images.reshape(B // 2, 2, H, W, -1)
    partner = pairs[:, ::-1]
    lam_b = lam[:, None, None, None, None]
    mixed = pairs * lam_b + partner * (1.0 - lam_b)
    cut = jnp.where(mask[:, None, :, :, None], partner, pairs)
    out = jnp.where(use_cutmix[:, None, None, None, None], cut, mixed)
    out = out.reshape(images.shape)

    if labels.ndim == 1:
        off = smoothing / num_classes
        on = 1.0 - smoothing + off
        y = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    else:
        y = labels
    yp = y.reshape(B // 2, 2, -1)
    lam_t = lam[:, None, None]
    targets = (yp * lam_t + yp[:, ::-1] * (1.0 - lam_t)).reshape(B, -1)
    return out, targets
