"""CLIP contrastive + affinity-mimicking losses, mesh-native.

Rebuild of TinyCLIP's ClipLoss (src/open_clip/loss.py:18-165) and ClipSoftLoss
(clip_soft_loss.py:54-88). The reference's NCCL feature all_gather with the
`local_loss=True` rank-offset-labels scheme maps directly onto
jax.lax.all_gather over the mesh 'data' axis inside shard_map: each shard
computes only its local block of the similarity matrix against the gathered
axis — identical math, and XLA differentiates the gather (no
torch.distributed.nn custom autograd needed).

Single-device path: axis_name=None (world_size==1 in the reference).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _gather(feat: jnp.ndarray, axis_name: str | None) -> jnp.ndarray:
    if axis_name is None:
        return feat
    return jax.lax.all_gather(feat, axis_name, tiled=True)


def clip_contrastive_loss(image_features: jnp.ndarray,
                          text_features: jnp.ndarray,
                          logit_scale: jnp.ndarray,
                          axis_name: str | None = None) -> jnp.ndarray:
    """Symmetric InfoNCE over the global batch; features must be normalized.

    With axis_name set (inside shard_map/pjit), logits are computed as the
    local block vs the gathered features and labels are offset by
    axis_index * local_batch (loss.py:139-154 local_loss path).
    """
    B = image_features.shape[0]
    all_img = _gather(image_features, axis_name)
    all_txt = _gather(text_features, axis_name)
    logits_i = logit_scale * image_features @ all_txt.T
    logits_t = logit_scale * text_features @ all_img.T
    offset = 0 if axis_name is None else jax.lax.axis_index(axis_name) * B
    labels = jnp.arange(B) + offset
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits_i, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits_t, labels)
    loss = (loss_i.mean() + loss_t.mean()) / 2
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def clip_soft_loss(image_features: jnp.ndarray, text_features: jnp.ndarray,
                   logit_scale: jnp.ndarray,
                   teacher_image_features: jnp.ndarray,
                   teacher_text_features: jnp.ndarray,
                   teacher_logit_scale: jnp.ndarray,
                   axis_name: str | None = None,
                   average_two_losses: bool = True):
    """Affinity mimicking (clip_soft_loss.py:54-88): the student's image->text
    and text->image similarity rows are trained with soft CE toward the
    teacher's rows over the same global batch."""
    all_txt_s = _gather(text_features, axis_name)
    all_img_s = _gather(image_features, axis_name)
    all_txt_t = _gather(teacher_text_features, axis_name)
    all_img_t = _gather(teacher_image_features, axis_name)

    def soft_ce(student_logits, teacher_logits):
        p = jax.nn.softmax(teacher_logits, axis=-1)
        logq = jax.nn.log_softmax(student_logits, axis=-1)
        return -(p * logq).sum(-1).mean()

    s_i = logit_scale * image_features @ all_txt_s.T
    s_t = logit_scale * text_features @ all_img_s.T
    t_i = teacher_logit_scale * teacher_image_features @ all_txt_t.T
    t_t = teacher_logit_scale * teacher_text_features @ all_img_t.T

    li = soft_ce(s_i, t_i)
    lt = soft_ce(s_t, t_t)
    if axis_name is not None:
        li = jax.lax.pmean(li, axis_name)
        lt = jax.lax.pmean(lt, axis_name)
    if average_two_losses:
        return (li + lt) / 2
    return li, lt
