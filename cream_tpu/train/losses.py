"""Loss zoo: the classification + distillation losses used across the nine
reference projects, as pure jnp functions.

  * label-smoothing CE (DeiT/Swin lineages)
  * soft-target CE (TinyViT distillation, main.py:93-97)
  * DeiT-style DistillationLoss wrapper — none/soft/hard (iRPE losses.py,
    EfficientViT losses.py:8-24)
  * dense-teacher recovery from saved top-K sparse logits
    (TinyViT/main.py:320-328)
  * MiniViT relation/hidden distillation (Mini-Swin/main.py:39-77)
  * CDARTS interactive loss (KL with T^2, lib/models/loss.py:24-37)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def label_smoothing_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       smoothing: float = 0.1) -> jnp.ndarray:
    n = logits.shape[-1]
    target = optax.smooth_labels(jax.nn.one_hot(labels, n), smoothing)
    return optax.softmax_cross_entropy(logits, target).mean()


def soft_target_ce(logits: jnp.ndarray, target_probs: jnp.ndarray) -> jnp.ndarray:
    """CE against a dense probability target: mean over batch of -sum p log q."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(target_probs * logp).sum(axis=-1).mean()


def kl_divergence(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                  tau: float = 1.0) -> jnp.ndarray:
    """KL(teacher || student) * tau^2, batch-mean."""
    pt = jax.nn.softmax(teacher_logits / tau, axis=-1)
    log_pt = jax.nn.log_softmax(teacher_logits / tau, axis=-1)
    log_ps = jax.nn.log_softmax(student_logits / tau, axis=-1)
    return ((pt * (log_pt - log_ps)).sum(-1) * tau * tau).mean()


def deit_distillation_loss(base_loss: jnp.ndarray,
                           student_logits: jnp.ndarray,
                           teacher_logits: jnp.ndarray,
                           kind: str = "soft", alpha: float = 0.5,
                           tau: float = 1.0) -> jnp.ndarray:
    """base*(1-alpha) + distill*alpha; kind in {none, soft, hard}.

    'soft' is tau^2-scaled KL; 'hard' is CE against the teacher argmax —
    matching iRPE/DeiT-with-iRPE/losses.py and EfficientViT losses.py.
    """
    if kind == "none" or alpha == 0.0:
        return base_loss
    if kind == "soft":
        dist = kl_divergence(student_logits, teacher_logits, tau)
    elif kind == "hard":
        dist = optax.softmax_cross_entropy_with_integer_labels(
            student_logits, jnp.argmax(teacher_logits, axis=-1)).mean()
    else:
        raise ValueError(f"unknown distillation kind {kind}")
    return base_loss * (1 - alpha) + dist * alpha


def dense_from_topk(values: jnp.ndarray, indices: jnp.ndarray,
                    num_classes: int) -> jnp.ndarray:
    """Reconstruct dense teacher probabilities from saved top-K.

    values (B, K) softmax probs, indices (B, K) int. Non-topK classes share
    the residual mass uniformly (`minor_value`, TinyViT/main.py:320-328).
    """
    B, K = values.shape
    minor = (1.0 - values.sum(axis=-1, keepdims=True)) / (num_classes - K)
    minor = jnp.maximum(minor, 0.0)
    dense = jnp.broadcast_to(minor, (B, num_classes))
    onehot = jax.nn.one_hot(indices, num_classes, dtype=values.dtype)  # B,K,C
    dense = dense * (1.0 - onehot.sum(axis=1))  # zero the topk slots
    dense = dense + jnp.einsum("bk,bkc->bc", values, onehot)
    return dense


def relation_distillation_loss(student_qkv: jnp.ndarray,
                               teacher_qkv: jnp.ndarray,
                               num_heads_group: int,
                               tau: float = 1.0) -> jnp.ndarray:
    """MiniViT attention-relation KD (Mini-Swin/main.py:39-57).

    qkv: (3, B, H, N, D) stacked q,k,v. Builds the 9 cross relation matrices
    softmax(x @ y^T / sqrt(D)) with heads grouped into `num_heads_group`
    groups, and returns mean soft-CE between teacher and student relations.
    """
    def relations(qkv):
        three, B, H, N, D = qkv.shape
        g = num_heads_group
        x = qkv.reshape(3, B, g, H // g, N, D)
        x = x.transpose(0, 1, 2, 4, 3, 5).reshape(3, B, g, N, (H // g) * D)
        scale = (x.shape[-1]) ** -0.5
        # all 3x3 pairs: (i,j) -> softmax(x_i x_j^T * scale)
        mats = jnp.einsum("ibgnd,jbgmd->ijbgnm", x, x) * scale
        return mats
    s = relations(student_qkv) / tau
    t = relations(teacher_qkv) / tau
    logp_s = jax.nn.log_softmax(s, axis=-1)
    p_t = jax.nn.softmax(t, axis=-1)
    return -(p_t * logp_s).sum(-1).mean() * (tau * tau)


def hidden_relation_loss(student_h: jnp.ndarray, teacher_h: jnp.ndarray
                         ) -> jnp.ndarray:
    """MiniViT hidden-state relation MSE (Mini-Swin/main.py:66-77):
    token-relation matrices of L2-normalized hidden states."""
    def rel(h):
        h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-6)
        return jnp.einsum("bnd,bmd->bnm", h, h)
    return jnp.mean((rel(student_h) - rel(teacher_h)) ** 2)


def interactive_loss(logits_a: jnp.ndarray, logits_b: jnp.ndarray,
                     kind: str = "kl", tau: float = 2.0) -> jnp.ndarray:
    """CDARTS search/eval-network interaction loss (lib/models/loss.py:24-37)."""
    if kind == "kl":
        return kl_divergence(logits_a, jax.lax.stop_gradient(logits_b), tau)
    if kind == "mse":
        return jnp.mean((logits_a - jax.lax.stop_gradient(logits_b)) ** 2)
    if kind == "cos":
        a = logits_a / (jnp.linalg.norm(logits_a, axis=-1, keepdims=True) + 1e-8)
        b = logits_b / (jnp.linalg.norm(logits_b, axis=-1, keepdims=True) + 1e-8)
        return -jnp.mean((a * jax.lax.stop_gradient(b)).sum(-1))
    raise ValueError(f"unknown interactive loss kind {kind}")
