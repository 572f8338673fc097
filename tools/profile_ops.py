"""On-device per-op attribution via jax.profiler xplane traces.

The working recipe in this environment (CLAUDE.md round-3 notes): trace with
jax.profiler, then parse the xplane.pb DIRECTLY with
tensorflow.tsl.profiler.protobuf.xplane_pb2 under
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python — the tensorboard_plugin_profile
converter is broken here. Sum 'XLA Ops' line events, EXCLUDING
copy-start/slice-start (async, overlapped with compute).

Usage:
  python tools/profile_ops.py eval  tiny_vit_21m_224 256
  python tools/profile_ops.py train tiny_vit_21m_224 256
  python tools/profile_ops.py eval  efficientvit_m5 512 --top 60
"""
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob
import re
import tempfile

import jax
import jax.numpy as jnp

N_STEPS = 5


def _trace(step, carry, *args):
    """Warm up, then trace N_STEPS carried iterations; return logdir.

    `step(carry, *args) -> new_carry` is scanned with the carry threaded
    through, so no part of the step is loop-hoisted or DCE'd. (A wrapper
    that returns only the loss lets XLA delete the whole backward+optimizer
    — observed: a "train profile" that was actually the train-mode forward.)"""
    @jax.jit
    def run(c, *a):
        def body(c, _):
            return step(c, *a), None
        c, _ = jax.lax.scan(body, c, None, length=N_STEPS)
        return jax.tree_util.tree_leaves(c)[0].astype(jnp.float32).sum()

    jax.device_get(run(carry, *args))    # compile + warm
    logdir = tempfile.mkdtemp(prefix="xprof_")
    jax.profiler.start_trace(logdir)
    jax.device_get(run(carry, *args))
    jax.profiler.stop_trace()
    return logdir


# async ops that overlap with compute — excluding them avoids double counting
ASYNC_RE = re.compile(r"(copy-start|copy-done|slice-start|all-gather-start|"
                      r"all-reduce-start|send|recv)")


def parse_xplane(logdir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    by_op = collections.Counter()
    by_cat = collections.Counter()
    total_ps = 0
    for p in paths:
        xspace = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = plane.event_metadata
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    if ASYNC_RE.search(name):
                        continue
                    cat = ""
                    for st in ev.stats:
                        if stat_meta[st.metadata_id].name == "hlo_category":
                            cat = st.str_value or st.ref_value
                    by_op[name] += ev.duration_ps
                    by_cat[cat or "?"] += ev.duration_ps
                    total_ps += ev.duration_ps
    return by_op, by_cat, total_ps


def report(by_op, by_cat, total_ps, top):
    scale = 1e-9 / N_STEPS  # ps -> ms, per step
    print(f"\n== total XLA-op time: {total_ps * scale:.2f} ms/step "
          f"(over {N_STEPS} steps) ==")
    print("\n-- by hlo_category --")
    for cat, ps in by_cat.most_common():
        print(f"  {ps * scale:8.3f} ms  {cat}")
    print(f"\n-- top {top} ops --")
    for name, ps in by_op.most_common(top):
        print(f"  {ps * scale:8.3f} ms  {name[:140]}")


def make_eval(name, batch):
    from cream_tpu.models import create_model
    model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                          jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    # carry = the input; each step perturbs it with the (tiny) logits mean so
    # iterations are data-dependent but the model sees realistic activations
    def step(x, v):
        out = model.apply(v, x)
        return x + out.astype(jnp.float32).mean().astype(x.dtype) * 1e-12

    return step, x, (variables,)


def make_train(name, batch):
    import optax

    from cream_tpu.models import create_model
    from cream_tpu.train import TrainState, make_train_step
    model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3),
                          jnp.bfloat16)
    labels = jax.random.randint(jax.random.key(2), (batch,), 0, 1000)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x, train=True)
    state = TrainState.create(params=variables["params"],
                              tx=optax.adamw(1e-3, weight_decay=0.05),
                              batch_stats=variables.get("batch_stats"))
    train_step = make_train_step(model, donate=False)
    rng = jax.random.key(3)

    def step(state, batch_d, rng):
        s, _ = train_step(state, batch_d, rng)
        return s
    return step, state, ({"image": x, "label": labels}, rng)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["eval", "train"])
    ap.add_argument("model")
    ap.add_argument("batch", type=int)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    global N_STEPS
    N_STEPS = args.steps
    fn, carry, fargs = (make_eval if args.mode == "eval" else make_train)(
        args.model, args.batch)
    logdir = _trace(fn, carry, *fargs)
    print(f"trace at {logdir}")
    by_op, by_cat, total = parse_xplane(logdir)
    report(by_op, by_cat, total, args.top)


if __name__ == "__main__":
    main()
