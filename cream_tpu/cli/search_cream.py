"""Cream prioritized-path search campaign CLI.

The full search loop of Cream/tools/train.py + lib/core/train.py:28-113:
  * stage depths sized from the FLOPs window via search_for_layer
    (lib/utils/search_structure_supernet.py:6-44)
  * per step: sample a student path (board-probability-biased, FLOPs-window
    rejection), pick a prioritized teacher (meta-matching when warm),
    meta-weighted KD+CE supernet update, 2nd-order meta-head update,
    candidate evaluation + PrioritizedBoard update
  * at the end: the best board path is physically exported with
    extract_childnet and verified against the supernet (logit parity).

Smoke recipe (synthetic data, ~2 min):

    python -m cream_tpu.cli.search_cream --synthetic --cpu \
        --flops-min 4e6 --flops-max 12e6 --epochs 2 --steps 4 \
        --meta-sta-epoch 0 --lr 0.01 --batch-size 8 --num-classes 8 \
        --img-size 64 --out /tmp/cream.json

(the board only accepts candidates at epochs > --meta-sta-epoch, reference
PrioritizedBoard semantics — a smoke run must clear that bar.)
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.models.cream import (CreamSupernet, MetaMatchingHead,
                                    extract_childnet)
from cream_tpu.nas.cream import (PrioritizedBoard, make_cream_train_step,
                                 make_meta_update_step, sample_architecture)
from cream_tpu.nas.flops import (arch_flops, build_flops_op_dict,
                                 build_flops_table, search_for_layer,
                                 sized_stages)
from cream_tpu.train.state import TrainState


def synthetic_batches(batch, num_classes, img, n, seed=0):
    rng = np.random.default_rng(seed)
    return [{"image": jnp.asarray(rng.standard_normal((batch, img, img, 3)),
                                  jnp.float32),
             "label": jnp.asarray(rng.integers(0, num_classes, batch))}
            for _ in range(n)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--flops-min", type=float, default=15e6)
    ap.add_argument("--flops-max", type=float, default=600e6)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--img-size", type=int, default=224,
                    help="overrides search_for_layer's sized resolution")
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--meta-lr", type=float, default=1e-4)
    ap.add_argument("--meta-sta-epoch", type=int, default=1)
    ap.add_argument("--pool-size", type=int, default=10)
    ap.add_argument("--max-sample-tries", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="cream_search.json")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # 1) size stage depths from the FLOPs window
    op_dict = build_flops_op_dict(args.img_size)
    sta_num, sized_res = search_for_layer(op_dict, args.flops_min,
                                          args.flops_max)
    if sta_num is None:
        raise SystemExit("FLOPs window unsatisfiable (search_for_layer)")
    stages = sized_stages(sta_num)
    img = args.img_size or sized_res
    print(f"sta_num={sta_num} resolution={sized_res} -> stages={stages}")

    model = CreamSupernet(num_classes=args.num_classes, stages=stages)
    meta = MetaMatchingHead()
    table = build_flops_table(img, stages=stages)
    layers_per_stage = [d for _, d, _ in stages]

    rng = np.random.default_rng(args.seed)
    batches = synthetic_batches(args.batch_size, args.num_classes, img,
                                args.steps, args.seed)
    val_batches = synthetic_batches(args.batch_size, args.num_classes, img,
                                    args.steps, args.seed + 1)

    a0 = jnp.asarray(sample_architecture(rng, layers_per_stage))
    variables = jax.jit(lambda r, x: model.init(r, x, a0))(
        jax.random.key(args.seed), batches[0]["image"])
    # the meta head flattens its input (forward_meta), so its width is fixed
    # by the KD slice size — init with exactly that shape
    mv_params = jax.jit(meta.init)(
        jax.random.key(args.seed + 1),
        jnp.zeros((meta_step_slice(args), args.num_classes)))

    tx = optax.sgd(args.lr, momentum=0.9)
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats"))
    meta_tx = optax.adam(args.meta_lr)
    meta_opt = meta_tx.init(mv_params)
    step_fn = make_cream_train_step(model, tx)
    meta_step = make_meta_update_step(model, meta, sgd_lr=args.lr,
                                      slice_size=max(2, args.batch_size // 4))
    board = PrioritizedBoard(pool_size=args.pool_size,
                             meta_sta_epoch=args.meta_sta_epoch)

    @jax.jit
    def eval_logits(variables, x, arch):
        return model.apply(variables, x, arch)

    def sample_in_window(prob):
        for _ in range(args.max_sample_tries):
            cand = sample_architecture(rng, layers_per_stage, prob=prob)
            fl = arch_flops(cand, table)
            if args.flops_min <= fl <= args.flops_max * 10:
                return cand, fl
        return cand, fl  # give up: last sample

    import time
    t0 = time.time()
    print(f"[{time.time()-t0:6.1f}s] compiled init; starting campaign",
          flush=True)
    history = []
    for epoch in range(args.epochs):
        for i, (batch, vbatch) in enumerate(zip(batches, val_batches)):
            cand, fl = sample_in_window(board.op_probability())
            a_s = jnp.asarray(cand)
            mv, t_arch = board.select_teacher(
                lambda x, a: eval_logits(state.variables, x, a),
                lambda d: meta.apply(mv_params, d), cand)
            use_kd = t_arch is not None
            a_t = jnp.asarray(t_arch if use_kd else cand)
            state, metrics = step_fn(state, batch, a_s, a_t,
                                     jnp.float32(mv if use_kd else 0.0),
                                     jnp.bool_(use_kd))
            if use_kd and epoch > args.meta_sta_epoch:
                t_probs = jax.nn.softmax(eval_logits(
                    state.variables, batch["image"][:meta_step_slice(args)],
                    a_t), -1)
                _, g = meta_step(mv_params, state.variables, batch["image"],
                                 batch["label"], a_s, a_t, t_probs)
                upd, meta_opt = meta_tx.update(g, meta_opt, mv_params)
                mv_params = optax.apply_updates(mv_params, upd)
            # candidate eval + board update
            logits = eval_logits(state.variables, vbatch["image"], a_s)
            prec1 = float((logits.argmax(-1) == vbatch["label"]).mean()) * 100
            sl = meta_step_slice(args)
            t_logits = jax.nn.softmax(eval_logits(
                state.variables, vbatch["image"][:sl], a_s), -1)
            board.update(epoch, prec1, fl, cand,
                         inputs=vbatch["image"][:sl], logits=t_logits)
        history.append({"epoch": epoch, "loss": float(metrics["loss"]),
                        "board": len(board),
                        "best_prec1": board.board[0].prec1 if len(board) else None})
        print(f"[{time.time()-t0:6.1f}s] epoch {epoch}: "
              f"loss {float(metrics['loss']):.3f} board {len(board)}",
              flush=True)

    if not len(board):
        raise SystemExit("board empty — raise --epochs past --meta-sta-epoch")
    best = board.board[0]
    child, child_vars = extract_childnet(
        jax.device_get(state.variables), best.arch,
        num_classes=args.num_classes, stages=stages)
    # parity: the physically-extracted childnet must match the supernet path
    x = val_batches[0]["image"][:2]
    sup = eval_logits(state.variables, x, jnp.asarray(best.arch))
    chd = jax.jit(lambda v, x: child.apply(v, x))(child_vars, x)
    err = float(jnp.max(jnp.abs(sup - chd)))
    assert err < 1e-4, f"childnet parity failed: {err}"

    result = {"sta_num": sta_num, "resolution": sized_res,
              "best_arch": [int(a) for a in np.asarray(best.arch).ravel()],
              "best_prec1": best.prec1, "best_flops": best.flops,
              "childnet_parity_maxdiff": err, "history": history}
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {args.out}; childnet parity maxdiff {err:.2e}")


def meta_step_slice(args) -> int:
    return max(2, args.batch_size // 4)


if __name__ == "__main__":
    main()
