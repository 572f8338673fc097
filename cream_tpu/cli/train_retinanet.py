"""RetinaNet-EfficientViT detection training/eval — the reference's
EfficientViT downstream (downstream/train.py + configs/retinanet_
efficientvit_m4_fpn_1x_coco.py) as a driveable command, minus the mmdet
runner machinery: AdamW (lr 1e-4, wd 0.05, attention_biases no-decay per
the config's paramwise_cfg), static-canvas COCO batches, fully-jitted
assign+loss step (no host matcher), native COCO-AP eval.

Smoke (synthetic boxes, tiny canvas, CPU):

    python -m cream_tpu.cli.train_retinanet --cpu --synthetic --steps 4 \
        --canvas 128 --batch-size 2 --num-classes 6

COCO mode:

    python -m cream_tpu.cli.train_retinanet --coco-img-dir val2017 \
        --coco-ann annotations/instances_val2017.json [--eval-only]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.models import create_model
from cream_tpu.models.retinanet import (anchors_per_level, retina_anchors,
                                        retinanet_decode, retinanet_loss)


def synthetic_batches(batch, canvas, max_boxes, num_classes, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        images = rng.standard_normal((batch, canvas, canvas, 3)) \
            .astype(np.float32)
        boxes = np.zeros((batch, max_boxes, 4), np.float32)
        labels = np.zeros((batch, max_boxes), np.int32)
        valid = np.zeros((batch, max_boxes), bool)
        for i in range(batch):
            k = rng.integers(1, max_boxes + 1)
            x1 = rng.uniform(0, canvas * 0.6, k)
            y1 = rng.uniform(0, canvas * 0.6, k)
            w = rng.uniform(canvas * 0.1, canvas * 0.4, k)
            h = rng.uniform(canvas * 0.1, canvas * 0.4, k)
            boxes[i, :k] = np.stack([x1, y1, np.minimum(x1 + w, canvas - 1),
                                     np.minimum(y1 + h, canvas - 1)], -1)
            labels[i, :k] = rng.integers(0, num_classes, k)
            valid[i, :k] = True
        out.append({"image": jnp.asarray(images), "boxes": jnp.asarray(boxes),
                    "labels": jnp.asarray(labels),
                    "valid": jnp.asarray(valid)})
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--coco-img-dir", default=None)
    ap.add_argument("--coco-ann", default=None)
    ap.add_argument("--model", default="retinanet_efficientvit_m0")
    ap.add_argument("--backbone", default=None,
                    help="NAS-searched backbone instead of --model: a "
                         "released Cream name (cream_14..cream_604), a JSON "
                         "file with a flat/per-stage Cream arch, or "
                         "'cdarts:<cells.json>' with per-group genotypes — "
                         "the CDARTS_detection composition")
    ap.add_argument("--canvas", type=int, default=512)
    ap.add_argument("--resize", type=int, default=480)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--max-boxes", type=int, default=32)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="retinanet_train.json")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.backbone:
        if args.backbone.startswith("cdarts:"):
            with open(args.backbone.split(":", 1)[1]) as f:
                model = create_model("retinanet_cdarts",
                                     genotypes=json.load(f),
                                     num_classes=args.num_classes)
        elif args.backbone.endswith(".json"):
            with open(args.backbone) as f:
                model = create_model("retinanet_cream", arch=json.load(f),
                                     num_classes=args.num_classes)
        else:
            model = create_model("retinanet_cream", arch=args.backbone,
                                 num_classes=args.num_classes)
    else:
        model = create_model(args.model, num_classes=args.num_classes)
    anchors = jnp.asarray(retina_anchors(args.canvas))
    level_sizes = anchors_per_level(args.canvas)

    coco = None
    if args.coco_img_dir and args.coco_ann:
        from cream_tpu.data.coco import CocoDetection, detection_loader
        coco = CocoDetection(args.coco_img_dir, args.coco_ann)
        # RetinaNet trains on xyxy ABSOLUTE canvas coords; reuse the COCO
        # loader's normalized cxcywh and convert
        def to_batches(train):
            out = []
            for b in detection_loader(coco, args.batch_size,
                                      canvas=(args.canvas, args.canvas),
                                      size=args.resize, max_size=args.canvas,
                                      max_boxes=args.max_boxes, train=train,
                                      seed=args.seed):
                cx, cy, w, h = [b["boxes"][..., i] for i in range(4)]
                sh, sw = b["scaled_size"][:, 0:1], b["scaled_size"][:, 1:2]
                x1 = (cx - w / 2) * sw
                y1 = (cy - h / 2) * sh
                x2 = (cx + w / 2) * sw
                y2 = (cy + h / 2) * sh
                out.append({
                    "image": jnp.asarray(b["image"]),
                    "boxes": jnp.asarray(
                        np.stack([x1, y1, x2, y2], -1), jnp.float32),
                    "labels": jnp.asarray(b["labels"]),
                    "valid": jnp.asarray(b["valid"]),
                    "image_id": b["image_id"],
                    "orig_size": b["orig_size"],
                    "scaled_size": b["scaled_size"]})
            return out
        batches = to_batches(train=not args.eval_only)
        if not batches:
            raise SystemExit("no full COCO batches; lower --batch-size")
    else:
        batches = synthetic_batches(args.batch_size, args.canvas,
                                    args.max_boxes, args.num_classes,
                                    max(2, args.steps // 2), args.seed)

    b0 = batches[0]
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(args.seed), b0["image"], train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    # attention_biases excluded from weight decay (config paramwise_cfg)
    def decay_mask(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not any("attention_biases" in str(k) for k in p),
            tree)

    tx = optax.adamw(args.lr, weight_decay=0.05, mask=decay_mask)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, bstats, opt, batch):
        def loss_fn(p):
            variables = {"params": p}
            if bstats:
                variables["batch_stats"] = bstats
                (cls, reg), mut = model.apply(
                    variables, batch["image"], train=True,
                    mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                cls, reg = model.apply(variables, batch["image"], train=True)
                new_stats = bstats
            losses = retinanet_loss(cls, reg, anchors, batch["boxes"],
                                    batch["labels"], batch["valid"],
                                    args.num_classes)
            return losses["loss_cls"] + losses["loss_bbox"], (losses,
                                                              new_stats)
        (loss, (losses, new_stats)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt, loss, losses

    @jax.jit
    def infer(params, bstats, images):
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
        return model.apply(variables, images, train=False)

    def coco_evaluate():
        from cream_tpu.train.coco_eval import evaluate_detections
        gts, dts = {}, {}
        for batch in batches:
            cls, reg = infer(params, bstats, batch["image"])
            dets = retinanet_decode(cls, reg, anchors, level_sizes)
            for i, iid in enumerate(np.asarray(batch["image_id"])):
                iid = int(iid)
                sh, sw = np.asarray(batch["scaled_size"])[i]
                oh, ow = np.asarray(batch["orig_size"])[i]
                sc = np.asarray([ow / sw, oh / sh, ow / sw, oh / sh])
                d = dets[i]
                xyxy = d["boxes"] * sc
                dts[iid] = {"boxes": np.concatenate(
                    [xyxy[:, :2], xyxy[:, 2:] - xyxy[:, :2]], 1),
                    "labels": d["labels"], "scores": d["scores"]}
                v = np.asarray(batch["valid"])[i]
                g_xyxy = np.asarray(batch["boxes"])[i][v] * sc
                gts[iid] = {"boxes": np.concatenate(
                    [g_xyxy[:, :2], g_xyxy[:, 2:] - g_xyxy[:, :2]], 1),
                    "labels": np.asarray(batch["labels"])[i][v]}
        metrics = evaluate_detections(gts, dts)
        print("COCO eval:", {k: round(v, 4) for k, v in metrics.items()},
              flush=True)
        return metrics

    if args.eval_only:
        metrics = coco_evaluate()
        json.dump(metrics, open(args.out, "w"), indent=2)
        return {"metrics": metrics}

    history = []
    for step in range(args.steps):
        batch = batches[step % len(batches)]
        params, bstats, opt, loss, losses = train_step(params, bstats, opt,
                                                       batch)
        rec = {"step": step, "total": float(loss),
               "loss_cls": float(losses["loss_cls"]),
               "loss_bbox": float(losses["loss_bbox"]),
               "num_pos": int(losses["num_pos"])}
        history.append(rec)
        print(f"step {step}: total {rec['total']:.3f} "
              f"cls {rec['loss_cls']:.3f} bbox {rec['loss_bbox']:.3f} "
              f"pos {rec['num_pos']}", flush=True)

    assert np.isfinite(history[-1]["total"])
    result = {"history": history}
    if coco is not None:
        result["metrics"] = coco_evaluate()
    json.dump(result, open(args.out, "w"), indent=2)
    print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
