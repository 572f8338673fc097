"""Optimizers + LR schedules.

Unifies the reference's per-project optimizer builders:
  * AdamW with no-weight-decay keyword filtering (TinyViT/optimizer.py,
    Swin-lineage set_weight_decay; DeiT-lineage create_optimizer) — here a
    predicate-mask optax.adamw.
  * layer-wise LR decay (TinyViT/models/tiny_vit.py:526-557 attaches
    p.lr_scale per block) — here an optax transform scaling updates by a
    per-leaf factor derived from the param path.
  * cosine schedule with linear warmup (TinyViT/lr_scheduler.py,
    DeiT cosine; TinyCLIP training/scheduler.py) and step schedule.
"""
from __future__ import annotations

import re
from typing import Callable, Mapping

import jax
import optax

NO_DECAY_PATTERNS = (r"\bbias\b", r"\bscale\b", r"attention_biases",
                     r"\bnorm", r"\bbn\b", r"logit_scale",
                     r"pos_embed", r"cls_token", r"rel_pos")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def weight_decay_mask(params) -> Mapping:
    """True where weight decay applies: 2D+ kernels, not norms/biases/tables."""
    def keep(path, x):
        p = _path_str(path)
        if any(re.search(pat, p) for pat in NO_DECAY_PATTERNS):
            return False
        return x.ndim >= 2
    return jax.tree_util.tree_map_with_path(keep, params)


def layer_lr_scales(params, depth: int,
                    block_of: Callable[[str], int | None],
                    decay_rate: float) -> Mapping:
    """Per-leaf LR scale tree: scale = decay_rate ** (depth - 1 - block_idx).

    block_of(path)->block index in [0, depth) or None for head params (treated
    as the last block, matching TinyViT set_layer_lr_decay).
    """
    def scale(path, x):
        p = _path_str(path)
        b = block_of(p)
        if b is None:
            b = depth - 1
        return decay_rate ** (depth - 1 - b)
    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_layer_lr(scales) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state
    return optax.GradientTransformation(init_fn, update_fn)


def make_adamw(learning_rate, weight_decay: float = 0.05,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               clip_grad: float | None = 5.0,
               params=None, layer_scales=None) -> optax.GradientTransformation:
    """AdamW with decay masking, optional grad clipping + layer-lr scaling.

    `learning_rate` may be a float or an optax schedule.
    """
    mask = weight_decay_mask(params) if params is not None else None
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                             weight_decay=weight_decay, mask=mask))
    if layer_scales is not None:
        chain.append(scale_by_layer_lr(layer_scales))
    return optax.chain(*chain)


def make_sgd(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0,
             nesterov: bool = False, clip_grad: float | None = None,
             params=None) -> optax.GradientTransformation:
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    if weight_decay:
        mask = weight_decay_mask(params) if params is not None else None
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    chain.append(optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov))
    return optax.chain(*chain)


def cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                    warmup_init_lr: float = 1e-7, min_lr: float = 1e-6):
    """Linear warmup then cosine decay to min_lr (TinyViT/lr_scheduler.py)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_init_lr, peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps, end_value=min_lr)


def step_schedule(base_lr: float, step_size: int, gamma: float = 0.1,
                  warmup_steps: int = 0, warmup_init_lr: float = 1e-7):
    """StepLR (used by TinyCLIP's prune phase, training/main.py:519)."""
    def sched(count):
        import jax.numpy as jnp
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * (
            count / jnp.maximum(warmup_steps, 1))
        decayed = base_lr * gamma ** ((count - warmup_steps) // step_size)
        return jnp.where(count < warmup_steps, warm, decayed)
    return sched
