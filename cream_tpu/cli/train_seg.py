"""CyDAS semantic-segmentation training/eval — the reference's
CDARTS_segmentation/train/train_cydas.py as a driveable command: SGD
momentum 0.9 / wd 5e-4, exponential warmup then poly(0.9) LR
(tools/utils/lr_scheduler.py), OHEM CE with min_kept = B*H*W/16 and the
lamb=0.2 deep-supervision mix (train_cydas.py:397,415-423), running train
mIoU from per-batch intersection/union (seg_metrics.py), whole-image eval
mIoU. The whole train step — fwd, three OHEM losses, bwd, SGD, metric
histogram — is one jitted program; the LR is traced data so one compile
serves every step.

Smoke (synthetic blocky labels, CPU):

    python -m cream_tpu.cli.train_seg --cpu --synthetic --steps 4 \
        --crop 64 --batch-size 2 --num-classes 7

Cityscapes-format mode (images dir + same-stem trainId label PNGs):

    python -m cream_tpu.cli.train_seg --img-dir leftImg8bit/train \
        --lab-dir gtFine/train --epochs 2 [--eval-img-dir ... --eval-lab-dir ...]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.models import create_model
from cream_tpu.train.segmentation import (batch_intersection_union,
                                          cydas_seg_loss, miou_from_hist,
                                          seg_confusion)


def poly_warmup_lr(base_lr, warmup_start, warmup_iters, max_iter):
    """Iter_LR_Scheduler poly mode: warmup_start * f^it for it < warmup
    (f = (base/start)^(1/warmup)), then base * (1 - t)^0.9."""
    def lr(it):
        it = jnp.asarray(it, jnp.float32)
        if warmup_iters > 0:
            factor = (base_lr / warmup_start) ** (1.0 / warmup_iters)
            warm = warmup_start * factor ** it
        else:
            warm = base_lr
        t = (it - warmup_iters) / max(max_iter - warmup_iters, 1)
        poly = base_lr * jnp.maximum(1.0 - t, 0.0) ** 0.9
        return jnp.where(it < warmup_iters, warm, poly)
    return lr


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--img-dir", default=None)
    ap.add_argument("--lab-dir", default=None)
    ap.add_argument("--eval-img-dir", default=None)
    ap.add_argument("--eval-lab-dir", default=None)
    ap.add_argument("--model", default="cydas_seg")
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--crop", type=int, default=769)
    ap.add_argument("--eval-canvas", type=int, nargs=2, default=None,
                    help="eval H W (default: crop x crop)")
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--steps", type=int, default=None,
                    help="cap total steps (smoke mode)")
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--warmup-start-lr", type=float, default=5e-6)
    ap.add_argument("--warmup-iters", type=int, default=1000)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--aux-weight", type=float, default=0.2)
    ap.add_argument("--ohem-thresh", type=float, default=0.7)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="seg_train.json")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    crop = (args.crop, args.crop)
    model = create_model(args.model, num_classes=args.num_classes)

    ds = eval_ds = None
    if args.img_dir and args.lab_dir:
        from cream_tpu.data.segmentation import SegFolder
        ds = SegFolder(args.img_dir, args.lab_dir)
        steps_per_epoch = max(len(ds) // args.batch_size, 1)
        if args.eval_img_dir and args.eval_lab_dir:
            eval_ds = SegFolder(args.eval_img_dir, args.eval_lab_dir)
    else:
        args.synthetic = True
        steps_per_epoch = max(2, (args.steps or 4) // 2)
        args.epochs = -(-(args.steps or 4) // steps_per_epoch)
    max_iter = args.epochs * steps_per_epoch
    if args.steps is not None:
        max_iter = min(max_iter, args.steps)
    # reference min_kept: batch * H * W // 16 (train_cydas.py:227)
    min_kept = args.batch_size * crop[0] * crop[1] // 16

    x0 = jnp.zeros((args.batch_size, *crop, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(args.seed), x0, train=True)
    params, bstats = variables["params"], variables["batch_stats"]

    lr_fn = poly_warmup_lr(args.lr, args.warmup_start_lr,
                           0 if args.synthetic else args.warmup_iters,
                           max_iter)
    # torch-SGD semantics: momentum accumulates (grad + wd*p), lr applied
    # after the momentum trace (train_cydas.py:271)
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay),
                     optax.sgd(learning_rate=lr_fn, momentum=0.9))
    opt = tx.init(params)

    @jax.jit
    def train_step(params, bstats, opt, batch):
        def loss_fn(p):
            preds, mut = model.apply(
                {"params": p, "batch_stats": bstats}, batch["image"],
                train=True, mutable=["batch_stats"])
            loss, parts = cydas_seg_loss(
                preds, batch["label"], min_kept=min_kept,
                thresh=args.ohem_thresh, aux_weight=args.aux_weight)
            return loss, (parts, preds[0], mut["batch_stats"])
        (loss, (parts, pred8, new_stats)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
        inter, union = batch_intersection_union(
            pred8.argmax(-1), batch["label"], args.num_classes)
        return params, new_stats, opt, loss, parts, inter, union

    @jax.jit
    def eval_step(params, bstats, batch):
        pred = model.apply({"params": params, "batch_stats": bstats},
                           batch["image"])
        return seg_confusion(pred.argmax(-1), batch["label"],
                             args.num_classes)

    def run_eval():
        from cream_tpu.data.segmentation import seg_eval_batches
        canvas = tuple(args.eval_canvas) if args.eval_canvas else crop
        hist = np.zeros((args.num_classes, args.num_classes), np.float32)
        for batch in seg_eval_batches(eval_ds, args.batch_size, canvas):
            hist += np.asarray(eval_step(params, bstats,
                                         jax.tree.map(jnp.asarray, batch)))
        miou, iou = miou_from_hist(jnp.asarray(hist))
        return {"miou": float(miou),
                "iou": [round(float(v), 4) for v in iou]}

    if args.eval_only:
        if eval_ds is None:
            raise SystemExit("--eval-only needs --eval-img-dir/--eval-lab-dir")
        metrics = run_eval()
        print("eval:", metrics["miou"], flush=True)
        json.dump(metrics, open(args.out, "w"), indent=2)
        return metrics

    history, it = [], 0
    inter_sum = np.zeros(args.num_classes, np.float64)
    union_sum = np.zeros(args.num_classes, np.float64)
    for epoch in range(args.epochs):
        if args.synthetic:
            from cream_tpu.data.segmentation import synthetic_seg_batches
            batches = synthetic_seg_batches(args.batch_size, crop,
                                            args.num_classes,
                                            steps_per_epoch, args.seed)
        else:
            from cream_tpu.data.segmentation import seg_train_batches
            batches = seg_train_batches(ds, args.batch_size, crop,
                                        seed=args.seed, epoch=epoch)
        for batch in batches:
            batch = jax.tree.map(jnp.asarray, batch)
            params, bstats, opt, loss, parts, inter, union = train_step(
                params, bstats, opt, batch)
            inter_sum += np.asarray(inter, np.float64)
            union_sum += np.asarray(union, np.float64)
            run_miou = float(np.mean(
                inter_sum[union_sum > 0] / union_sum[union_sum > 0])) \
                if (union_sum > 0).any() else 0.0
            rec = {"step": it, "loss": float(loss),
                   "loss8": float(parts["loss8"]),
                   "lr": float(lr_fn(it)), "train_miou": run_miou}
            history.append(rec)
            print(f"epoch {epoch} it {it}: loss {rec['loss']:.4f} "
                  f"lr {rec['lr']:.5f} mIoU {run_miou:.3f}", flush=True)
            it += 1
            if it >= max_iter:
                break
        if it >= max_iter:
            break

    assert np.isfinite(history[-1]["loss"])
    result = {"history": history[-20:]}
    if eval_ds is not None:
        result["metrics"] = run_eval()
        print("eval mIoU:", result["metrics"]["miou"], flush=True)
    json.dump(result, open(args.out, "w"), indent=2)
    print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
