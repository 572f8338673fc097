"""CDARTS — cyclic differentiable architecture search driver.

Rebuild of CDARTS/CDARTS/search.py + lib/core/search_function.py:6-143:
alternating optimization between
  weight steps: CE on the search network's weights (train split)
  alpha steps:  on the val split — CE through the search net PLUS the
                interactive loss (T^2-scaled KL) pulling the search network's
                logits toward the discretized eval network's logits
                (search_function.py:40-70), plus an L1 penalty on
                pool/skip alphas (the reference's regularizer discouraging
                parameter-free ops).
Periodically the current genotype is discretized and the eval network
(AugmentCNN) is retrained from scratch or continued — the 'cyclic' feedback.

All three steps are jitted; alphas are a plain pytree optimized with its own
optax transform (the reference's separate alpha optimizer w/ betas(0.5,0.999)).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from cream_tpu.models.darts import PRIMITIVES
from cream_tpu.train.losses import interactive_loss


def alpha_l1_regularization(alphas: dict, weight: float = 1e-3) -> jnp.ndarray:
    """L1 on softmax weight of pool/skip ops (search_function.py's
    regularization discouraging parameter-free operators)."""
    idxs = [PRIMITIVES.index(p) for p in
            ("max_pool_3x3", "avg_pool_3x3", "skip_connect")]
    total = 0.0
    for a in alphas.values():
        w = jax.nn.softmax(a, -1)
        total = total + sum(w[:, i].sum() for i in idxs)
    return weight * total


def make_weight_step(search_model, tx: optax.GradientTransformation):
    """CE weight update for the search network."""

    def step(params, opt_state, batch_stats, alphas, batch):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats}
            logits, mut = search_model.apply(
                variables, batch["image"], alphas["normal"], alphas["reduce"],
                train=True, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()
            return loss, mut["batch_stats"]

        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, loss

    return jax.jit(step)


def make_alpha_step(search_model, alpha_tx: optax.GradientTransformation,
                    interactive_weight: float = 1.0, tau: float = 2.0,
                    l1_weight: float = 1e-3):
    """Alpha update on a val batch, optionally against eval-net logits."""

    def step(alphas, alpha_opt, params, batch_stats, batch,
             eval_logits=None):
        def loss_fn(a):
            variables = {"params": params, "batch_stats": batch_stats}
            logits = search_model.apply(variables, batch["image"],
                                        a["normal"], a["reduce"], train=False)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()
            if eval_logits is not None:
                loss = loss + interactive_weight * interactive_loss(
                    logits, eval_logits, kind="kl", tau=tau)
            return loss + alpha_l1_regularization(a, l1_weight)

        loss, g = jax.value_and_grad(loss_fn)(alphas)
        updates, alpha_opt = alpha_tx.update(g, alpha_opt, alphas)
        alphas = optax.apply_updates(alphas, updates)
        return alphas, alpha_opt, loss

    return jax.jit(step, static_argnames=())


class CyclicSearcher:
    """Host-side orchestration of the CDARTS loop (CDARTS/search.py):
    pretrain weights -> alternate (alpha step w/ eval-net interaction,
    weight step) -> discretize genotype per cycle."""

    def __init__(self, search_model, alphas, params, batch_stats,
                 weight_tx=None, alpha_tx=None):
        self.model = search_model
        self.alphas = alphas
        self.params = params
        self.batch_stats = batch_stats
        self.weight_tx = weight_tx or optax.sgd(0.05, momentum=0.9)
        self.alpha_tx = alpha_tx or optax.adam(3e-4, b1=0.5, b2=0.999)
        self.opt_state = self.weight_tx.init(params)
        self.alpha_opt = self.alpha_tx.init(alphas)
        self._wstep = make_weight_step(search_model, self.weight_tx)
        self._astep = make_alpha_step(search_model, self.alpha_tx)
        self.history: list = []

    def weight_step(self, batch) -> float:
        self.params, self.opt_state, self.batch_stats, loss = self._wstep(
            self.params, self.opt_state, self.batch_stats, self.alphas, batch)
        return float(loss)

    def alpha_step(self, val_batch, eval_logits=None) -> float:
        self.alphas, self.alpha_opt, loss = self._astep(
            self.alphas, self.alpha_opt, self.params, self.batch_stats,
            val_batch, eval_logits)
        return float(loss)

    def genotype(self):
        from cream_tpu.models.darts import parse_genotype
        return parse_genotype(self.alphas)

    def search_epoch(self, train_batches, val_batches, eval_logits_fn=None):
        for tb, vb in zip(train_batches, val_batches):
            wl = self.weight_step(tb)
            el = eval_logits_fn(vb) if eval_logits_fn else None
            al = self.alpha_step(vb, el)
            self.history.append({"weight_loss": wl, "alpha_loss": al})
        return self.genotype()
