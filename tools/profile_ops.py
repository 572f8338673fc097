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

    `step(carry, *args) -> new_carry` is jitted ALONE and dispatched N_STEPS
    times from python with the carry threaded through. Two traps this dodges
    (both observed here):
      * wrapping the steps in lax.scan puts every op inside a `while` body,
        and the device tracer attributes nothing below the while op;
      * returning only the loss (carry not threaded) lets XLA DCE the whole
        backward+optimizer — the "train profile" was the train-mode forward.
    Python-loop dispatch is fine for ATTRIBUTION (unlike timing): every op
    still executes on device and the final device_get forces them all."""
    run = jax.jit(step)
    carry = run(carry, *args)            # compile + warm
    jax.device_get(jax.tree_util.tree_leaves(carry)[0])
    logdir = tempfile.mkdtemp(prefix="xprof_")
    jax.profiler.start_trace(logdir)
    for _ in range(N_STEPS):
        carry = run(carry, *args)
    jax.device_get(jax.tree_util.tree_leaves(carry)[0])
    jax.profiler.stop_trace()
    return logdir


# async ops that overlap with compute — excluding them avoids double counting.
# Event names are the FULL instruction text (operands included), so anchor on
# the defining op: "%copy-done.3 = ..." — matching anywhere would also drop
# every compute op that merely CONSUMES a %copy-done value (observed: that
# mis-filter silently discarded 83% of a train-step timeline).
ASYNC_RE = re.compile(r"^%?(copy-start|copy-done|slice-start|all-gather-start|"
                      r"all-reduce-start|send|recv)[.\s]")


def opcode(nm: str) -> str:
    """The defining op's opcode from full HLO text: '%n = <shape> <opcode>(...'.
    Substring checks on the whole text mis-bucket CONSUMERS of custom-call /
    copy-done operands (hit twice here) — parse the opcode token instead."""
    if " = " not in nm:
        return nm.split("(")[0].lstrip("%")
    seg = nm.split(" = ", 1)[1]
    # the opcode is the first whitespace-delimited lowercase token directly
    # followed by "(" — shape text also contains "(" (tilings like T(8,128))
    # but never at a space boundary, so anchor on whitespace.
    m = re.search(r"(?:^|\s)([a-z][a-z0-9\-._]*)\(", seg)
    return m.group(1) if m else "?"


def classify(nm: str) -> str:
    """Coarse buckets (the hlo_category stat is absent in this env's traces)."""
    op = opcode(nm)
    head = nm.split(" = ")[0]
    if head.startswith(("%copy-done", "%copy-start", "%slice-start")):
        return "dma"
    if op == "custom-call":
        return "pallas custom-call"
    if op == "copy" or head.startswith("%copy"):
        return "layout copy"
    shape = nm.split(" = ")[1].split(" ")[0] if " = " in nm else ""
    if "56,56" in shape or "112,112" in shape:
        return "stem 56/112 fusions"
    if head.startswith(("%convert_reduce_fusion", "%reduce")):
        return "reduces"
    return "other fusions"


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
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    if ASYNC_RE.search(name):
                        continue
                    by_op[name] += ev.duration_ps
                    by_cat[classify(name)] += ev.duration_ps
                    total_ps += ev.duration_ps
    return by_op, by_cat, total_ps


def report(by_op, by_cat, total_ps, top):
    scale = 1e-9 / N_STEPS  # ps -> ms, per step
    print(f"\n== total XLA-op time: {total_ps * scale:.2f} ms/step "
          f"(over {N_STEPS} steps) ==")
    print("\n-- by class --")
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

    # carry = a scalar threaded through the input-adjacent PARAM leaves
    # (bench.perturb_variables) — the old `x + mean*1e-12` carry materialized
    # a full input-sized broadcast_add every step (0.91 ms at M0 bs1024,
    # round-5 profile) and polluted the attribution with a harness op.
    import bench

    def step(carry, v, x):
        out = model.apply(bench.perturb_variables(v, carry), x)
        return out.astype(jnp.float32).mean() * 1e-12

    return step, jnp.zeros((), jnp.float32), (variables, x)


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
