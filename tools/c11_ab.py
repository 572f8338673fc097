"""A/B: 1x1 ConvBN as an explicit channel dot (nn/layers.DEFAULT_CONV1X1_DOT)
on full models, TPU. Hypothesis: dot_general keeps activations row-major
where XLA's pointwise-conv emitter imposes batch-minor layouts (the M0
"layout copies" 2.22 ms bucket and part of TinyViT-train's stem cost).

  python tools/c11_ab.py eval     # M0 bs1024 + M5 bs512 + TinyViT bs256 eval
  python tools/c11_ab.py train    # TinyViT-21M bs256 + M5 bs512 train step
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from cream_tpu.nn import layers


def eval_ab():
    from cream_tpu.models import create_model
    for name, batch in (("efficientvit_m0", 1024), ("efficientvit_m5", 512),
                        ("tiny_vit_21m_224", 256)):
        for dot in (False, True):
            layers.DEFAULT_CONV1X1_DOT = dot
            jax.clear_caches()
            model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
            x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                                  jnp.bfloat16)
            variables = jax.jit(model.init)(jax.random.key(0), x)
            t0 = time.time()
            ips, _, _ = bench.timed_throughput(
                lambda v, x: model.apply(v, x), variables, x)
            print(f"{name} bs{batch} c11dot={dot}: {ips:.1f} img/s "
                  f"({time.time()-t0:.0f}s)", flush=True)


def train_ab():
    import optax

    from cream_tpu.models import create_model
    from cream_tpu.train import TrainState, make_train_step
    for name, batch in (("tiny_vit_21m_224", 256), ("efficientvit_m5", 512)):
        for dot in (False, True):
            layers.DEFAULT_CONV1X1_DOT = dot
            jax.clear_caches()
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
            print(f"{name} train bs{batch} c11dot={dot}: "
                  f"{batch*10/best:.1f} img/s ({time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    (train_ab if "train" in sys.argv else eval_ab)()
