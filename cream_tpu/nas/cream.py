"""Cream prioritized-path distillation: board + meta matching + train step.

Rebuild of Cream/lib/models/PrioritizedBoard.py:13-130 and
MetaMatchingNetwork.py:14-130 plus the train-loop wiring in
lib/core/train.py:28-80.

The reference's 2nd-order meta update is a hand-rolled chain of
torch.autograd.grad calls (grad of validation loss w.r.t. simulated-SGD
student weights, back through the KD gradient, into the teacher-selection
meta net). In JAX it is literally one jax.grad of a composed function:

    val_after(meta) = L_val(theta - lr * dL_kd(meta, theta)/dtheta)

so the whole run_update (MetaMatchingNetwork.py:100-130) collapses to a
single jitted second-order step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def sample_architecture(rng: np.random.Generator, layers_per_stage,
                        choice_num: int = 6, prob=None) -> np.ndarray:
    """Random path, board-probability-biased when prob given
    (PrioritizedBoard.get_cand_with_prob :76-92)."""
    arch = []
    for n in layers_per_stage:
        arch.extend(rng.choice(choice_num, size=n, p=prob).tolist())
    return np.asarray(arch, np.int32)


@dataclasses.dataclass
class BoardEntry:
    prec1: float
    flops: float
    arch: np.ndarray
    inputs: Any          # saved minibatch slice
    logits: Any          # softmax teacher features on that slice


class PrioritizedBoard:
    """Top-K path pool ordered by accuracy (PrioritizedBoard.py)."""

    def __init__(self, pool_size: int = 10, acc_gap: float = 5.0,
                 meta_sta_epoch: int = 20, choice_num: int = 6):
        self.pool_size = pool_size
        self.acc_gap = acc_gap
        self.meta_sta_epoch = meta_sta_epoch
        self.choice_num = choice_num
        self.board: list[BoardEntry] = []

    def __len__(self):
        return len(self.board)

    def is_update(self, epoch: int, prec1: float, flops: float) -> bool:
        if epoch <= self.meta_sta_epoch:
            return False
        if len(self.board) < self.pool_size:
            return True
        worst = self.board[-1]
        if prec1 > worst.prec1 + self.acc_gap:
            return True
        return prec1 > worst.prec1 and flops < worst.flops

    def update(self, epoch: int, prec1: float, flops: float, arch, inputs,
               logits):
        if not self.is_update(epoch, prec1, flops):
            return False
        self.board.append(BoardEntry(float(prec1), float(flops),
                                     np.asarray(arch), inputs, logits))
        self.board.sort(key=lambda e: -e.prec1)
        del self.board[self.pool_size:]
        return True

    def op_probability(self) -> np.ndarray | None:
        """'teacher' path-sampling bias: op frequency across the board
        (PrioritizedBoard.py:56-72)."""
        if not self.board:
            return None
        counts = np.zeros(self.choice_num)
        for e in self.board:
            for op in np.asarray(e.arch).ravel():
                if op >= 0:
                    counts[op] += 1
        if counts.sum() == 0:
            return None
        return counts / counts.sum()

    def select_teacher(self, apply_fn, meta_apply_fn, student_arch):
        """meta pick (PrioritizedBoard.py:27-42): for each entry score the
        student's drift on the stored slice with the meta head; returns
        (meta_value, teacher_arch). top1 pick: (0.5, best arch)."""
        if not self.board:
            return None, None
        if meta_apply_fn is None:
            return 0.5, self.board[0].arch
        best_w, best = -1e9, None
        for e in self.board:
            out = jax.nn.softmax(apply_fn(e.inputs, jnp.asarray(e.arch)), -1)
            w = float(meta_apply_fn(out - e.logits))
            if w > best_w:
                best_w, best = w, e
        meta_value = float(jax.nn.sigmoid(-jnp.asarray(best_w)))
        return meta_value, best.arch


def soft_kd_loss(student_logits, teacher_probs):
    logp = jax.nn.log_softmax(student_logits, -1)
    return -(teacher_probs * logp).sum(-1).mean()


def make_meta_update_step(model, meta_head, sgd_lr: float = 0.1,
                          slice_size: int = 8):
    """Returns meta_step(params, meta_params, batch, student_arch,
    teacher_arch, stored_logits_diff_inputs) -> new_meta_params gradient.

    Implements the simulate-SGD-then-validate chain
    (MetaMatchingNetwork.run_update :100-130) as one jax.grad.
    """

    def val_after_update(meta_params, params, x_kd, x_val, y_val,
                         student_arch, teacher_arch, kd_inputs_logits):
        # teacher output on the KD slice (stop-grad, reference uses no_grad)
        t_logits = jax.lax.stop_gradient(
            model.apply(params, x_kd, teacher_arch))
        t_probs = jax.nn.softmax(t_logits, -1)
        # meta value from the meta head on the student's drift
        s_out = jax.nn.softmax(model.apply(params, x_kd, student_arch), -1)
        w = meta_head.apply(meta_params, s_out - kd_inputs_logits)
        meta_value = jax.nn.sigmoid(-w)

        def kd_loss(p):
            s_logits = model.apply(p, x_kd, student_arch)
            return meta_value * soft_kd_loss(s_logits, t_probs)

        g = jax.grad(lambda p: kd_loss(p))(params)
        simulated = jax.tree_util.tree_map(lambda w_, g_: w_ - sgd_lr * g_,
                                           params, g)
        v_logits = model.apply(simulated, x_val, student_arch)
        return optax.softmax_cross_entropy_with_integer_labels(
            v_logits, y_val).mean()

    @jax.jit
    def meta_step(meta_params, params, x, y, student_arch, teacher_arch,
                  kd_logits):
        x_kd = x[:slice_size]
        x_val, y_val = x[slice_size:2 * slice_size], y[slice_size:2 * slice_size]
        loss, g = jax.value_and_grad(val_after_update)(
            meta_params, params, x_kd, x_val, y_val, student_arch,
            teacher_arch, kd_logits)
        return loss, g

    return meta_step


def make_cream_train_step(model, tx, meta_head=None):
    """Student step: loss = (meta_value*KD + (2-meta_value)*CE)/2
    (Cream/lib/core/train.py:28-66); plain CE before the board warms up."""

    def step(state, batch, student_arch, teacher_arch, meta_value, use_kd):
        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(variables, batch["image"], student_arch,
                              train=True, mutable=mutable)
            logits, new_stats = (out[0], out[1]["batch_stats"]) if mutable \
                else (out, state.batch_stats)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()

            t_logits = jax.lax.stop_gradient(model.apply(
                variables, batch["image"], teacher_arch, train=False))
            kd = soft_kd_loss(logits, jax.nn.softmax(t_logits, -1))
            kd_total = (meta_value * kd + (2.0 - meta_value) * ce) / 2.0
            loss = jnp.where(use_kd, kd_total, ce)
            acc = (logits.argmax(-1) == batch["label"]).mean()
            return loss, (new_stats, acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {"loss": loss, "accuracy": acc}

    return jax.jit(step)
