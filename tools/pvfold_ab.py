"""A/B: PV-fold-norm forward in the window-attention kernel
(ops/pallas/window_attention.PV_FOLD_NORM) on full models, TPU.

The exact per-row softmax's sum-reduce + (rows, KP) divide move off the VPU:
rowsum rides the PV dot as an appended ones-column, divide deferred to the
(N, dv+1) output tile. The per-row max-subtract is retained (range-safe).

  python tools/pvfold_ab.py eval     # S3-T bs128 + TinyViT-21M bs256 eval
  python tools/pvfold_ab.py train    # TinyViT-21M bs256 train step
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from cream_tpu.ops.pallas import window_attention as wa


def eval_ab():
    from cream_tpu.models import create_model
    for name, batch in (("s3_tiny", 128), ("tiny_vit_21m_224", 256)):
        for fold in (False, True):
            wa.PV_FOLD_NORM = fold
            jax.clear_caches()  # the inner @jax.jit caches ignore the flag
            model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
            x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                                  jnp.bfloat16)
            variables = jax.jit(model.init)(jax.random.key(0), x)
            t0 = time.time()
            ips, _, _ = bench.timed_throughput(
                lambda v, x: model.apply(v, x), variables, x)
            print(f"{name} bs{batch} pv_fold={fold}: {ips:.1f} img/s "
                  f"({time.time()-t0:.0f}s)", flush=True)


def train_ab():
    import optax

    from cream_tpu.models import create_model
    from cream_tpu.train import TrainState, make_train_step
    for fold in (False, True):
        wa.PV_FOLD_NORM = fold
        jax.clear_caches()  # the inner @jax.jit caches ignore the flag
        model = create_model("tiny_vit_21m_224", num_classes=1000,
                             dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.key(1), (256, 224, 224, 3),
                              jnp.bfloat16)
        labels = jax.random.randint(jax.random.key(2), (256,), 0, 1000)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.key(0), x, train=True)
        state = TrainState.create(params=variables["params"],
                                  tx=optax.adamw(1e-3, weight_decay=0.05),
                                  batch_stats=variables.get("batch_stats"))
        step = make_train_step(model, donate=False)
        batch_d = {"image": x, "label": labels}
        rng = jax.random.key(3)

        def run(state, n=10):
            def body(s, _):
                s, m = step(s, batch_d, rng)
                return s, m["loss"]
            return jax.lax.scan(body, state, None, length=n)

        g = jax.jit(lambda s: run(s)[1].sum())
        t0 = time.time()
        jax.device_get(g(state))
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            jax.device_get(g(state))
            best = min(best, time.perf_counter() - t1)
        print(f"train pv_fold={fold}: {256*10/best:.1f} img/s "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    (train_ab if "train" in sys.argv else eval_ab)()
