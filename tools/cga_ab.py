"""A/B: EfficientViT CGA attention-core Pallas kernel (ops/pallas/cga_core.py)
vs the XLA einsum chain, eval path on TPU.

  python tools/cga_ab.py          # M0 bs1024 + M5 bs512
  python tools/cga_ab.py m0       # just M0
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from cream_tpu.ops.pallas import cga_core

ROWS = [("efficientvit_m0", 1024), ("efficientvit_m5", 512)]


def run(name, batch):
    from cream_tpu.models import create_model
    for core in (False, True):
        cga_core.DEFAULT_CORE_KERNEL = core
        model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                              jnp.bfloat16)
        variables = jax.jit(model.init)(jax.random.key(0), x)
        t0 = time.time()
        ips, _, _ = bench.timed_throughput(
            lambda v, x: model.apply(v, x), variables, x)
        print(f"{name} bs{batch} core={core}: {ips:.1f} img/s "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    want = [a for a in sys.argv[1:] if not a.startswith("-")]
    for name, batch in ROWS:
        if want and not any(w in name for w in want):
            continue
        run(name, batch)
