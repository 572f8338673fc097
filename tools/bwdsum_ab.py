"""A/B: MXU-routed row sums in the window-attention BACKWARD kernel
(ops/pallas/window_attention.BWD_MXU_SUM) on full train steps, TPU.

The bwd kernel's two VPU lane-reduces per stacked tile — the softmax
recompute's row sum and the dS rowsum(dP*P) — move to MXU dot-with-ones;
the exact per-row max and the divides stay on the VPU.

  python tools/bwdsum_ab.py                 # S3-T bs128 + TinyViT bs256 train
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cream_tpu.ops.pallas import window_attention as wa


def train_ab():
    import optax

    from cream_tpu.models import create_model
    from cream_tpu.train import TrainState, make_train_step
    for name, batch in (("s3_tiny", 128), ("tiny_vit_21m_224", 256)):
        for mxu in (False, True):
            wa.BWD_MXU_SUM = mxu
            jax.clear_caches()  # the inner @jax.jit caches ignore the flag
            model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
            x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                                  jnp.bfloat16)
            labels = jax.random.randint(jax.random.key(2), (batch,), 0, 1000)
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
            print(f"{name} bs{batch} train bwd_mxu_sum={mxu}: "
                  f"{batch*10/best:.1f} img/s ({time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    train_ab()
