"""TPU A/B: fused Pallas depthwise vs XLA conv — micro + full train step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

STAGE0 = (64, 56, 56, 384)  # quarter batch for the micro (compile speed)


def timed(fn, *args, n=10, reps=3):
    """One jitted lax.scan with a data-dependent carry; best-of-reps."""
    def body(c, _):
        o = fn(c, *args[1:])
        return (c + o * 1e-12).astype(c.dtype), ()
    # device_get only ever touches scalars — big-tensor pulls through the
    # axon tunnel take minutes and would dominate the measurement.
    g = jax.jit(lambda a: lax.scan(body, a, None, length=n)[0].sum())
    jax.device_get(g(args[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(g(args[0]))
        best = min(best, time.perf_counter() - t0)
    return best / n


def micro():
    from cream_tpu.ops.dwconv import _dw_fwd_raw, dw_conv3x3_fused
    B, H, W, C = STAGE0
    kx, kw, kd = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, 1, C), jnp.float32)
    dy = jax.random.normal(kd, (B, H, W, C), jnp.bfloat16)

    print("compiling fused fwd...", flush=True)
    t0 = time.time()
    y = jax.jit(lambda a, b: dw_conv3x3_fused(a, b).astype(jnp.float32).mean())(x, w)
    jax.device_get(y)
    print(f"  fused fwd compiled+ran in {time.time()-t0:.1f}s", flush=True)

    def loss_fused(x, w):
        return jnp.sum(dw_conv3x3_fused(x, w).astype(jnp.float32) * dy.astype(jnp.float32))

    def loss_xla(x, w):
        return jnp.sum(_dw_fwd_raw(x, w).astype(jnp.float32) * dy.astype(jnp.float32))

    # correctness vs XLA, diffs computed ON DEVICE (scalar fetches only)
    @jax.jit
    def grad_diff(x, w):
        gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        return (jnp.abs(gx.astype(jnp.float32) - rx.astype(jnp.float32)).max(),
                jnp.abs(gw - rw).max())

    print("compiling fused+xla bwd...", flush=True)
    t0 = time.time()
    ddx, ddw = jax.device_get(grad_diff(x, w))
    print(f"  bwd compiled+ran in {time.time()-t0:.1f}s; "
          f"grad diff dx: {float(ddx)} dw: {float(ddw)}", flush=True)

    t_f = timed(lambda c: dw_conv3x3_fused(c, w), x)
    t_xf = timed(lambda c: _dw_fwd_raw(c, w), x)
    print(f"  fwd: fused {t_f*1e3:.2f} ms vs XLA {t_xf*1e3:.2f} ms", flush=True)

    gj = jax.jit(lambda c: jax.grad(loss_fused, argnums=(0,))(c, w)[0])
    rj = jax.jit(lambda c: jax.grad(loss_xla, argnums=(0,))(c, w)[0])
    t_b = timed(gj, x)
    t_xb = timed(rj, x)
    print(f"  fwd+bwd: fused {t_b*1e3:.2f} ms vs XLA {t_xb*1e3:.2f} ms", flush=True)


def micro_s2():
    from cream_tpu.ops.dwconv import _dw2_fwd_raw, dw_conv3x3s2_fused
    B, H, W, C = 64, 56, 56, 192  # PM0 shape (quarter batch)
    kx, kw, kd = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, 1, C), jnp.float32)
    dy = jax.random.normal(kd, (B, H // 2, W // 2, C), jnp.bfloat16)

    def loss_fused(x, w):
        return jnp.sum(dw_conv3x3s2_fused(x, w).astype(jnp.float32)
                       * dy.astype(jnp.float32))

    def loss_xla(x, w):
        return jnp.sum(_dw2_fwd_raw(x, w).astype(jnp.float32)
                       * dy.astype(jnp.float32))

    @jax.jit
    def grad_diff(x, w):
        gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        return (jnp.abs(gx.astype(jnp.float32) - rx.astype(jnp.float32)).max(),
                jnp.abs(gw - rw).max())

    ddx, ddw = jax.device_get(grad_diff(x, w))
    print(f"  s2 grad diff dx: {float(ddx)} dw: {float(ddw)}", flush=True)
    t_f = timed(lambda c: dw_conv3x3s2_fused(c, w), x)
    t_xf = timed(lambda c: _dw2_fwd_raw(c, w), x)
    print(f"  s2 fwd: fused {t_f*1e3:.2f} ms vs XLA {t_xf*1e3:.2f} ms", flush=True)
    gj = jax.jit(lambda c: jax.grad(loss_fused, argnums=(0,))(c, w)[0])
    rj = jax.jit(lambda c: jax.grad(loss_xla, argnums=(0,))(c, w)[0])
    print(f"  s2 fwd+bwd: fused {timed(gj, x)*1e3:.2f} ms vs XLA {timed(rj, x)*1e3:.2f} ms",
          flush=True)


def micro_wgrad():
    """Isolated weight-grad only: Pallas one-pass vs XLA's batch-group conv."""
    from cream_tpu.ops.dwconv import _dw_fwd_raw, _pallas_wgrad
    B, H, W, C = STAGE0
    kx, kw, kd = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, 1, C), jnp.float32)
    dy = jax.random.normal(kd, (B, H, W, C), jnp.bfloat16)

    def xla_wgrad(x, dy):
        _, vjp = jax.vjp(lambda w_: _dw_fwd_raw(x, w_), w)
        return vjp(dy)[0]

    @jax.jit
    def diff(x, dy):
        a = _pallas_wgrad(x, dy).reshape(3, 3, 1, C)
        b = xla_wgrad(x, dy)
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    d, m = jax.device_get(diff(x, dy))
    print(f"  wgrad diff {float(d)} (ref max {float(m)})", flush=True)
    # reduce to a scalar so the timing carry (x-shaped) can absorb the output
    t_p = timed(lambda c: _pallas_wgrad(c, dy).sum(), x)
    t_x = timed(lambda c: xla_wgrad(c, dy).sum(), x)
    print(f"  wgrad: pallas {t_p*1e3:.2f} ms vs XLA batch-group {t_x*1e3:.2f} ms",
          flush=True)


def full(modes=(False, "wgrad")):
    import bench
    import cream_tpu.ops.dwconv as dw
    for flag in modes:
        dw.DEFAULT_DW_VJP = flag
        t0 = time.time()
        r = bench.bench_train_step("tiny_vit_21m_224", 256)
        print(f"train dw_vjp={flag}: {r['items_per_s']} img/s "
              f"(compile+bench {time.time()-t0:.0f}s)  {r}", flush=True)


if __name__ == "__main__":
    if "wgrad" in sys.argv:
        micro_wgrad()
    elif "full" in sys.argv:
        full()
    elif "s2" in sys.argv:
        micro_s2()
    else:
        micro()
