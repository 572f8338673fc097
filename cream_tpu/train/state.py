"""Train state: params + batch_stats + optimizer state + EMA, one pytree.

Unifies the reference's per-project checkpoint dicts
{model, optimizer, lr_scheduler, scaler, epoch, max_accuracy}
(TinyViT/utils.py:57-258, AutoFormer/supernet_train.py:329) into a single
jit-friendly dataclass. No loss scaler is needed: TPU trains in bf16 compute
with fp32 params/optimizer state, so the AMP GradScaler machinery has no
equivalent here.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_params: Any = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, *, params, tx, batch_stats=None, ema_decay: float = 0.0):
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats if batch_stats is not None else {},
                   opt_state=tx.init(params), tx=tx,
                   # real copy — donation would otherwise see aliased buffers
                   ema_params=jax.tree_util.tree_map(jnp.copy, params)
                   if ema_decay > 0 else None,
                   ema_decay=ema_decay)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), self.ema_params, new_params)
        return self.replace(
            step=self.step + 1, params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state, ema_params=new_ema)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
