"""AutoFormer supernet training engine.

The per-batch random-config sampling loop of AutoFormer/supernet_engine.py:
26-112: every batch trains a different subnet (sampled uniformly from the
space) against CE (optionally + teacher KD :66-71). With the masked supernet
the sampled config is jit INPUT data, so the whole engine is one compiled
step re-used for every config — no per-config retraces, no 'retrain the
supernet shape' cost.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.models.autoformer import SearchSpace, encode_config, sample_config
from cream_tpu.train.losses import deit_distillation_loss
from cream_tpu.train.state import TrainState


def make_supernet_train_step(model, teacher_apply: Callable | None = None,
                             distill_kind: str = "none", alpha: float = 0.5,
                             tau: float = 1.0):
    """step(state, batch, enc_config, rng) -> (state, metrics)."""

    def step(state: TrainState, batch, enc, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = model.apply({"params": params}, batch["image"], enc,
                                 train=True, rngs={"drop_path": rng})
            base = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()
            if teacher_apply is not None and distill_kind != "none":
                t_logits = jax.lax.stop_gradient(teacher_apply(batch["image"]))
                base = deit_distillation_loss(base, logits, t_logits,
                                              kind=distill_kind, alpha=alpha,
                                              tau=tau)
            acc = (logits.argmax(-1) == batch["label"]).mean()
            return base, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "accuracy": acc}

    return jax.jit(step)


def train_supernet_epoch(state: TrainState, step_fn, batches, space: SearchSpace,
                         epoch: int, rng_seed: int = 0, log=print,
                         log_every: int = 50):
    """One epoch of random-subnet training; the config RNG is re-seeded per
    epoch (supernet_engine.py:36) so runs are reproducible."""
    cfg_rng = np.random.default_rng(rng_seed + epoch)
    key = jax.random.key(rng_seed)
    losses = []
    for i, batch in enumerate(batches):
        enc = encode_config(sample_config(cfg_rng, space), space)
        state, metrics = step_fn(state, batch, enc, key)
        losses.append(float(metrics["loss"]))
        if i % log_every == 0:
            log(f"supernet epoch {epoch} [{i}] loss={losses[-1]:.4f} "
                f"acc={float(metrics['accuracy']):.4f}")
    return state, losses
