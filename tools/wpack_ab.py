"""A/B: paired-window packing in the window-attention kernel
(ops/pallas/window_attention.WIN_PACK) on full models, TPU.

G=2 packs two adjacent 49-token windows per kernel iteration (98 of 128
lanes real instead of 49), halving the tiny-dot/softmax-pass/slice-write
issue count; cross-window terms are -1e9-biased out.

  python tools/wpack_ab.py eval     # S3-T bs128 + TinyViT-21M bs256 eval
  python tools/wpack_ab.py train    # S3-T bs128 + TinyViT-21M bs256 train
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
        for g in (1, 2):
            wa.WIN_PACK = g
            jax.clear_caches()  # the inner @jax.jit caches ignore the flag
            model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
            x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                                  jnp.bfloat16)
            variables = jax.jit(model.init)(jax.random.key(0), x)
            t0 = time.time()
            ips, _, _ = bench.timed_throughput(
                lambda v, x: model.apply(v, x), variables, x)
            print(f"{name} bs{batch} win_pack={g}: {ips:.1f} img/s "
                  f"({time.time()-t0:.0f}s)", flush=True)


def train_ab():
    import optax

    from cream_tpu.models import create_model
    from cream_tpu.train import TrainState, make_train_step
    for name, batch in (("s3_tiny", 128), ("tiny_vit_21m_224", 256)):
        for g in (1, 2):
            wa.WIN_PACK = g
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

            g_fn = jax.jit(lambda s: run(s)[1].sum())
            t0 = time.time()
            jax.device_get(g_fn(state))
            best = float("inf")
            for _ in range(3):
                t1 = time.perf_counter()
                jax.device_get(g_fn(state))
                best = min(best, time.perf_counter() - t1)
            print(f"{name} bs{batch} train win_pack={g}: "
                  f"{batch*10/best:.1f} img/s ({time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    (train_ab if "train" in sys.argv else eval_ab)()
