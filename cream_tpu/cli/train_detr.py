"""DETR detection training loop — the reference's main.py/engine.py
(iRPE/DETR-with-iRPE) as a driveable command.

Per step: jitted forward + matching costs -> host Hungarian assignment ->
jitted loss/grad/update (the only host<->device traffic is the (B, Q, M)
cost tensor and the (B, M) assignment). Backbone LR multiplier and grad
clipping follow the reference defaults (main.py: lr_backbone 1e-5, lr 1e-4,
clip_max_norm 0.1).

Smoke recipe (synthetic boxes, tiny model, CPU, ~2 min):

    python -m cream_tpu.cli.train_detr --cpu --synthetic --steps 6 \
        --batch-size 4 --image-size 128 --num-classes 8 \
        --enc-rpe2d rpe-1.9-product-ctx-1-k --out /tmp/detr_smoke.json

COCO mode (datasets/coco.py + engine.py:68 evaluate + coco_eval.py roles):
point --coco-img-dir/--coco-ann at a COCO-format directory; training runs on
static-canvas batches (data/coco.py) and finishes with a native-AP COCO eval
(train/coco_eval.py — the pycocotools bbox protocol, dependency-free). Add
--eval-only for evaluation without training:

    python -m cream_tpu.cli.train_detr --coco-img-dir val2017 \
        --coco-ann annotations/instances_val2017.json --num-classes 91 \
        --num-queries 100 --eval-only
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.models.detr import DETR, parse_enc_rpe2d
from cream_tpu.models.resnet import ResNetBackbone
from cream_tpu.train import detection as D


def synthetic_batches(batch, img, max_boxes, num_classes, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        images = rng.standard_normal((batch, img, img, 3)).astype(np.float32)
        nb = rng.integers(1, max_boxes + 1, batch)
        boxes = np.zeros((batch, max_boxes, 4), np.float32)
        labels = np.zeros((batch, max_boxes), np.int64)
        valid = np.zeros((batch, max_boxes), bool)
        for i, k in enumerate(nb):
            cx, cy = rng.uniform(0.2, 0.8, (2, k))
            w, h = rng.uniform(0.05, 0.3, (2, k))
            boxes[i, :k] = np.stack([cx, cy, w, h], -1)
            labels[i, :k] = rng.integers(0, num_classes, k)
            valid[i, :k] = True
        out.append({"image": jnp.asarray(images),
                    "boxes": jnp.asarray(boxes),
                    "labels": jnp.asarray(labels),
                    "valid": jnp.asarray(valid)})
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--coco-img-dir", default=None,
                    help="COCO images dir (e.g. val2017/)")
    ap.add_argument("--coco-ann", default=None,
                    help="COCO instances_*.json annotations")
    ap.add_argument("--canvas", type=int, default=512,
                    help="fixed square canvas (static shapes); images are "
                         "aspect-resized then zero-padded with a pixel mask")
    ap.add_argument("--resize", type=int, default=480)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--num-classes", type=int, default=8)
    ap.add_argument("--num-queries", type=int, default=16)
    ap.add_argument("--max-boxes", type=int, default=6)
    ap.add_argument("--hidden-dim", type=int, default=64)
    ap.add_argument("--enc-layers", type=int, default=2)
    ap.add_argument("--dec-layers", type=int, default=2)
    ap.add_argument("--enc-rpe2d", default="rpe-1.9-product-ctx-1-k",
                    help="'' disables RPE (plain DETR)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--clip-norm", type=float, default=0.1)
    ap.add_argument("--eos-coef", type=float, default=0.1)
    ap.add_argument("--aux-loss", action="store_true", default=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="detr_train.json")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    model = DETR(backbone=ResNetBackbone((1, 1, 1, 1), "basic"),
                 num_classes=args.num_classes, num_queries=args.num_queries,
                 hidden_dim=args.hidden_dim, nhead=4,
                 num_encoder_layers=args.enc_layers,
                 num_decoder_layers=args.dec_layers,
                 dim_feedforward=args.hidden_dim * 4, aux_loss=args.aux_loss,
                 rpe_config=parse_enc_rpe2d(args.enc_rpe2d))
    coco = None
    if args.coco_img_dir and args.coco_ann:
        from cream_tpu.data.coco import CocoDetection, detection_loader
        coco = CocoDetection(args.coco_img_dir, args.coco_ann)

        def coco_batches(train, epoch=0):
            for b in detection_loader(
                    coco, args.batch_size, canvas=(args.canvas, args.canvas),
                    size=args.resize, max_size=args.canvas,
                    max_boxes=args.max_boxes, train=train, seed=args.seed,
                    epoch=epoch):
                yield {k: jnp.asarray(v) if k != "image_id" else v
                       for k, v in b.items()}

        batches = list(coco_batches(train=not args.eval_only))
        if not batches:
            raise SystemExit("COCO dir yielded no full batches; lower "
                             "--batch-size")
    else:
        batches = synthetic_batches(args.batch_size, args.image_size,
                                    args.max_boxes, args.num_classes,
                                    max(2, args.steps // 2), args.seed)
    b0 = batches[0]
    variables = jax.jit(lambda r: model.init(
        r, b0["image"], b0.get("pad_mask")))(jax.random.key(args.seed))
    params, constants = variables["params"], variables.get("constants", {})

    tx = optax.chain(optax.clip_by_global_norm(args.clip_norm),
                     optax.adamw(args.lr, weight_decay=1e-4))
    opt = tx.init(params)

    @jax.jit
    def forward_and_cost(params, batch):
        out = model.apply({"params": params, "constants": constants},
                          batch["image"], batch.get("pad_mask"))
        costs = [D.matching_cost(o["pred_logits"], o["pred_boxes"],
                                 batch["boxes"], batch["labels"],
                                 batch["valid"])
                 for o in [out] + out.get("aux_outputs", [])]
        return out, costs

    @jax.jit
    def update(params, opt, batch, assigns):
        def loss_fn(p):
            out = model.apply({"params": p, "constants": constants},
                              batch["image"], batch.get("pad_mask"))
            num_boxes = jnp.maximum(
                batch["valid"].sum().astype(jnp.float32), 1.0)
            outs = [out] + out.get("aux_outputs", [])
            total = 0.0
            main_losses = None
            for o, a in zip(outs, assigns):
                l = D.detection_loss(o, batch["boxes"], batch["labels"],
                                     batch["valid"], a, args.num_classes,
                                     args.eos_coef, num_boxes)
                if main_losses is None:
                    main_losses = l
                total = total + l["loss_ce"] + 5.0 * l["loss_bbox"] \
                    + 2.0 * l["loss_giou"]
            return total, main_losses

        (loss, ml), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss, ml

    def coco_evaluate():
        """AP over the COCO batches (engine.py:68 evaluate +
        coco_eval.py, pycocotools-free)."""
        from cream_tpu.train.coco_eval import evaluate_detections
        from cream_tpu.train.detection import post_process
        gts, dts = {}, {}
        for batch in batches:
            out = forward_and_cost(params, batch)[0]
            res = post_process(
                {"pred_logits": out["pred_logits"],
                 "pred_boxes": out["pred_boxes"]}, batch["orig_size"])
            for i, iid in enumerate(np.asarray(batch["image_id"])):
                iid = int(iid)
                r = res[i]
                xyxy = np.asarray(r["boxes"])
                dts[iid] = {
                    "boxes": np.concatenate(
                        [xyxy[:, :2], xyxy[:, 2:] - xyxy[:, :2]], 1),
                    "labels": np.asarray(r["labels"]),
                    "scores": np.asarray(r["scores"])}
                oh, ow = np.asarray(batch["orig_size"])[i]
                v = np.asarray(batch["valid"])[i]
                cxcywh = np.asarray(batch["boxes"])[i][v]
                scale = np.asarray([ow, oh, ow, oh], np.float32)
                xywh = np.concatenate(
                    [cxcywh[:, :2] - cxcywh[:, 2:] / 2, cxcywh[:, 2:]],
                    1) * scale
                gts[iid] = {"boxes": xywh,
                            "labels": np.asarray(batch["labels"])[i][v]}
        metrics = evaluate_detections(gts, dts)
        print("COCO eval:", {k: round(v, 4) for k, v in metrics.items()},
              flush=True)
        return metrics

    if args.eval_only:
        metrics = coco_evaluate()
        with open(args.out, "w") as fh:
            json.dump(metrics, fh, indent=2)
        return metrics

    history = []
    for step in range(args.steps):
        batch = batches[step % len(batches)]
        _, costs = forward_and_cost(params, batch)
        assigns = [jnp.asarray(D.hungarian_assign(
            np.asarray(jax.device_get(c)),
            np.asarray(jax.device_get(batch["valid"])))) for c in costs]
        params, opt, loss, ml = update(params, opt, batch, assigns)
        rec = {"step": step, "total": float(loss),
               **{k: float(v) for k, v in ml.items()}}
        history.append(rec)
        print(f"step {step}: total {rec['total']:.3f} "
              f"ce {rec['loss_ce']:.3f} bbox {rec['loss_bbox']:.3f} "
              f"giou {rec['loss_giou']:.3f}", flush=True)

    assert np.isfinite(history[-1]["total"])
    result = {"history": history}
    if coco is not None:
        result["metrics"] = coco_evaluate()
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {args.out}; final total {history[-1]['total']:.3f}")
    return result


if __name__ == "__main__":
    main()
