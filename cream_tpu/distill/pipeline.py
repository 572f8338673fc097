"""Fast-pretraining-distillation training step (TinyViT).

The student-side loop of TinyViT/main.py:284-400
(train_one_epoch_distill_using_saved_logits): reconstruct the dense teacher
distribution from the saved top-K (losses.dense_from_topk) and train with
soft-target CE. Augmentation replay is free in this framework: the loader's
per-sample seeds are deterministic in (base_seed, epoch, index), the same
values the save_logits pass stored.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cream_tpu.train.losses import dense_from_topk, soft_target_ce
from cream_tpu.train.state import TrainState


def make_distill_train_step(model, num_classes: int, mesh: Mesh | None = None):
    """Returns step(state, batch, rng) for batches
    {image, topk_values (B,K), topk_indices (B,K)}."""

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        target = dense_from_topk(batch["topk_values"],
                                 batch["topk_indices"], num_classes)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(variables, batch["image"], train=True,
                              mutable=mutable,
                              rngs={"drop_path": rng, "dropout": rng})
            if mutable:
                logits, mut = out
                new_stats = mut["batch_stats"]
            else:
                logits, new_stats = out, state.batch_stats
            loss = soft_target_ce(logits.astype(jnp.float32), target)
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        # teacher-agreement meter (main.py teacher-acc logging)
        agree = (logits.argmax(-1) == batch["topk_indices"][:, 0]).mean()
        return state, {"loss": loss, "teacher_agree": agree,
                       "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(repl, {"image": data, "topk_values": data,
                                        "topk_indices": data}, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))
