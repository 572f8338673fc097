"""jit-compiled train/eval step factories with mesh data-parallelism.

Replaces the reference's engine loops' inner bodies
(AutoFormer/supernet_engine.py:26-112, TinyViT/main.py:284-400,
EfficientViT/classification/engine.py:21-77): forward, loss, backward,
optimizer step, metric reduction. DDP allreduce + MetricLogger
synchronize_between_processes become XLA-inserted collectives: the batch is
sharded over the mesh 'data' axis, params are replicated, and jnp.mean over
the loss IS the cross-device reduction.

BatchNorm note: like the reference (torch DDP without SyncBN), BN batch stats
are computed per-device shard; running stats converge the same way.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cream_tpu.train.state import TrainState


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """labels: int class ids (B,) or soft targets (B, C)."""
    if labels.ndim == logits.ndim:
        return optax.softmax_cross_entropy(logits, labels).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(model, loss_fn: Callable = cross_entropy_loss,
                    mesh: Mesh | None = None, donate: bool = True):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'image': (B,H,W,C), 'label': (B,) or (B,num_classes)}.
    If `mesh` is given, the step is jitted with batch sharded over 'data' and
    state replicated — XLA inserts the gradient all-reduce over ICI.
    """

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        drop_rng, dropout_rng = jax.random.split(rng)

        def loss_from_params(params):
            variables = {"params": params}
            rngs = {"drop_path": drop_rng, "dropout": dropout_rng}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                # note: mutable=[] would ALSO switch apply to tuple returns —
                # only pass it when there are batch stats to thread
                logits, mutated = model.apply(variables, batch["image"],
                                              train=True,
                                              mutable=["batch_stats"],
                                              rngs=rngs)
                new_stats = mutated["batch_stats"]
            else:
                logits = model.apply(variables, batch["image"], train=True,
                                     rngs=rngs)
                new_stats = state.batch_stats
            loss = loss_fn(logits, batch["label"])
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_from_params, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)

        metrics = {"loss": loss}
        if batch["label"].ndim == 1:
            metrics["accuracy"] = jnp.mean(
                (jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, {"image": data, "label": data}, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Mesh | None = None, use_ema: bool = False):
    """Returns eval_step(state, batch) -> metrics (sum-reduced counts).

    Counts (correct@1, correct@5, n) are summed so the caller can aggregate
    exactly over a sharded eval set — the equivalent of the reference's
    distributed-eval allreduce (EfficientViT/classification/utils.py:33-47).
    """

    def step(state: TrainState, batch):
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, batch["image"], train=False)
        labels = batch["label"]
        top1 = (jnp.argmax(logits, -1) == labels)
        top5 = jnp.any(
            jax.lax.top_k(logits, 5)[1] == labels[:, None], axis=-1)
        # mask out padded examples (label < 0)
        valid = labels >= 0
        return {
            "correct1": jnp.sum(top1 & valid),
            "correct5": jnp.sum(top5 & valid),
            "n": jnp.sum(valid),
            "loss_sum": jnp.sum(jnp.where(
                valid, optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.maximum(labels, 0)), 0.0)),
        }

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(repl, {"image": data, "label": data}),
                   out_shardings=repl)
