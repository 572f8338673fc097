"""Bisect the wgrad-mode TPU worker crash: run each Pallas wgrad variant at
every dw-conv shape TinyViT-21M's train step hits, one at a time."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cream_tpu.ops import dwconv

B = 256
S1_SHAPES = [(B, 56, 56, 384)]                     # stage-0 MBConv hidden
S2_SHAPES = [(B, 56, 56, 192), (B, 28, 28, 384), (B, 14, 14, 576)]  # PM0-2


def run(tag, fn, shape):
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, 1, shape[-1]), jnp.float32)

    def loss(x, w):
        return jnp.sum(fn(x, w).astype(jnp.float32))

    g = jax.jit(lambda x, w: [t.astype(jnp.float32).sum()
                              for t in jax.grad(loss, argnums=(0, 1))(x, w)])
    try:
        out = jax.device_get(g(x, w))
        print(f"OK   {tag} {shape}: {out}", flush=True)
    except Exception as e:
        print(f"FAIL {tag} {shape}: {type(e).__name__}: {e}", flush=True)
        raise SystemExit(1)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "s1"):
    for s in S1_SHAPES:
        run("s1_wg", dwconv.dw_conv3x3_wg, s)
if which in ("all", "s2"):
    # dw_conv3x3s2_wg was excised in round 5 (full-graph TPU worker fault,
    # ISSUES.md #1). Historical record: every shape in S2_SHAPES PASSED this
    # isolated harness on the same chip that faulted in the full train step.
    print("s2_wg excised (ISSUES.md #1); isolated shapes all passed when it "
          "existed", flush=True)
print("done")
