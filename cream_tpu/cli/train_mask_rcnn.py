"""Mask R-CNN-EfficientViT training/eval — the reference's second
EfficientViT downstream (downstream/configs/mask_rcnn_efficientvit_m4_fpn_
1x_coco.py via mmdet's two-stage runner), as one driveable command with the
whole two-stage train step in a SINGLE jit: RPN assign+sample+loss,
static-shape proposal NMS, RCNN sampling as randomized-priority top-k,
dense multi-level RoIAlign, bbox + mask heads and all five losses — no
host round-trips inside the step.

Smoke (synthetic boxes + rectangle masks, tiny canvas, CPU):

    python -m cream_tpu.cli.train_mask_rcnn --cpu --synthetic --steps 4 \
        --canvas 128 --batch-size 2 --num-classes 6

COCO mode (bbox + segm AP, masks rasterized from polygons):

    python -m cream_tpu.cli.train_mask_rcnn --coco-img-dir val2017 \
        --coco-ann annotations/instances_val2017.json [--eval-only]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from cream_tpu.models import create_model
from cream_tpu.models.mask_rcnn import (MaskRCNN, mask_loss,
                                        mask_rcnn_anchor_levels,
                                        mask_rcnn_anchors, mask_rcnn_decode,
                                        rcnn_loss, rcnn_stage, rpn_loss,
                                        rpn_proposals)

MASK_STRIDE = 4


def synthetic_batches(batch, canvas, max_boxes, num_classes, n, seed=0):
    """Boxes + filled-rectangle instance masks at stride-4 resolution."""
    rng = np.random.default_rng(seed)
    ms = canvas // MASK_STRIDE
    out = []
    for _ in range(n):
        images = rng.standard_normal((batch, canvas, canvas, 3)) \
            .astype(np.float32)
        boxes = np.zeros((batch, max_boxes, 4), np.float32)
        labels = np.zeros((batch, max_boxes), np.int32)
        valid = np.zeros((batch, max_boxes), bool)
        masks = np.zeros((batch, max_boxes, ms, ms), bool)
        for i in range(batch):
            k = int(rng.integers(1, max_boxes + 1))
            x1 = rng.uniform(0, canvas * 0.6, k)
            y1 = rng.uniform(0, canvas * 0.6, k)
            w = rng.uniform(canvas * 0.15, canvas * 0.4, k)
            h = rng.uniform(canvas * 0.15, canvas * 0.4, k)
            x2 = np.minimum(x1 + w, canvas - 1)
            y2 = np.minimum(y1 + h, canvas - 1)
            boxes[i, :k] = np.stack([x1, y1, x2, y2], -1)
            labels[i, :k] = rng.integers(0, num_classes, k)
            valid[i, :k] = True
            for j in range(k):
                masks[i, j, int(y1[j]) // MASK_STRIDE:int(y2[j]) // MASK_STRIDE,
                      int(x1[j]) // MASK_STRIDE:int(x2[j]) // MASK_STRIDE] = True
        out.append({"image": jnp.asarray(images), "boxes": jnp.asarray(boxes),
                    "labels": jnp.asarray(labels), "valid": jnp.asarray(valid),
                    "masks": jnp.asarray(masks)})
    return out


def paste_mask(mask28: np.ndarray, box: np.ndarray, ms: int) -> np.ndarray:
    """Resize a 28x28 sigmoid mask to the box extent at stride-4 canvas
    resolution and threshold .5 (mmdet FCNMaskHead.get_seg_masks)."""
    x1, y1, x2, y2 = (box / MASK_STRIDE).tolist()
    w = max(int(round(x2 - x1)), 1)
    h = max(int(round(y2 - y1)), 1)
    im = Image.fromarray(mask28.astype(np.float32), mode="F")
    resized = np.asarray(im.resize((w, h), Image.BILINEAR))
    out = np.zeros((ms, ms), bool)
    ox, oy = int(round(x1)), int(round(y1))
    ox0, oy0 = max(ox, 0), max(oy, 0)
    sub = resized[oy0 - oy:oy0 - oy + ms - oy0, ox0 - ox:ox0 - ox + ms - ox0]
    out[oy0:oy0 + sub.shape[0], ox0:ox0 + sub.shape[1]] = sub >= 0.5
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--coco-img-dir", default=None)
    ap.add_argument("--coco-ann", default=None)
    ap.add_argument("--model", default="mask_rcnn_efficientvit_m0")
    ap.add_argument("--canvas", type=int, default=512)
    ap.add_argument("--resize", type=int, default=480)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--max-boxes", type=int, default=32)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--rpn-samples", type=int, default=256)
    ap.add_argument("--rcnn-samples", type=int, default=128,
                    help="sampled rois/img (mmdet config: 512)")
    ap.add_argument("--proposals", type=int, default=256,
                    help="post-NMS proposals/img kept (static shape)")
    ap.add_argument("--max-dets", type=int, default=100)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="mask_rcnn_train.json")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    model: MaskRCNN = create_model(args.model, num_classes=args.num_classes)
    anchors = jnp.asarray(mask_rcnn_anchors(args.canvas))
    level_sizes = mask_rcnn_anchor_levels(args.canvas)
    pos_cap = max(int(args.rcnn_samples * 0.25), 1)

    coco = None
    if args.coco_img_dir and args.coco_ann:
        from cream_tpu.data.coco import CocoDetection, detection_loader
        coco = CocoDetection(args.coco_img_dir, args.coco_ann)

        def to_batches(train):
            out = []
            for b in detection_loader(coco, args.batch_size,
                                      canvas=(args.canvas, args.canvas),
                                      size=args.resize, max_size=args.canvas,
                                      max_boxes=args.max_boxes, train=train,
                                      seed=args.seed, with_masks=True,
                                      mask_stride=MASK_STRIDE):
                cx, cy, w, h = [b["boxes"][..., i] for i in range(4)]
                sh, sw = b["scaled_size"][:, 0:1], b["scaled_size"][:, 1:2]
                out.append({
                    "image": jnp.asarray(b["image"]),
                    "boxes": jnp.asarray(np.stack(
                        [(cx - w / 2) * sw, (cy - h / 2) * sh,
                         (cx + w / 2) * sw, (cy + h / 2) * sh], -1),
                        jnp.float32),
                    "labels": jnp.asarray(b["labels"]),
                    "valid": jnp.asarray(b["valid"]),
                    "masks": jnp.asarray(b["masks"]),
                    "image_id": b["image_id"],
                    "orig_size": b["orig_size"],
                    "scaled_size": b["scaled_size"]})
            if not out:
                raise SystemExit("no full COCO batches; lower --batch-size")
            return out
        batches = to_batches(train=not args.eval_only)
    else:
        batches = synthetic_batches(args.batch_size, args.canvas,
                                    args.max_boxes, args.num_classes,
                                    max(2, args.steps // 2), args.seed)

    b0 = batches[0]
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(args.seed), b0["image"], train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def decay_mask(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not any("attention_biases" in str(k) for k in p),
            tree)

    tx = optax.adamw(args.lr, weight_decay=0.05, mask=decay_mask)
    opt = tx.init(params)

    def rois_flat(rois_b):
        """(B, R, 4) xyxy -> (B*R, 5) with batch index column."""
        B, R, _ = rois_b.shape
        bi = jnp.repeat(jnp.arange(B, dtype=jnp.float32), R)[:, None]
        return jnp.concatenate([bi, rois_b.reshape(B * R, 4)], axis=1)

    @jax.jit
    def train_step(params, bstats, opt, batch, rng):
        r_rpn, r_rcnn = jax.random.split(rng)

        def loss_fn(p):
            variables = {"params": p}
            if bstats:
                variables["batch_stats"] = bstats
                feats, mut = model.apply(
                    variables, batch["image"], True,
                    method=MaskRCNN.features, mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                feats = model.apply(variables, batch["image"], True,
                                    method=MaskRCNN.features)
                new_stats = bstats
            rpn_cls, rpn_reg = model.apply(variables, feats,
                                           method=MaskRCNN.rpn)
            l_rpn_cls, l_rpn_reg = rpn_loss(
                rpn_cls, rpn_reg, anchors, batch["boxes"], batch["valid"],
                r_rpn, num_samples=args.rpn_samples)
            props, pscore = rpn_proposals(
                jax.lax.stop_gradient(rpn_cls),
                jax.lax.stop_gradient(rpn_reg), anchors, level_sizes,
                args.canvas, max_per_img=args.proposals)
            B = props.shape[0]
            tgt = jax.vmap(
                lambda k, pr, pv, g, l, v: rcnn_stage(
                    k, pr, pv, g, l, v, args.num_classes,
                    num=args.rcnn_samples))(
                jax.random.split(r_rcnn, B), props, pscore > 0,
                batch["boxes"], batch["labels"], batch["valid"])
            r5 = rois_flat(tgt["rois"])
            cls_logits, reg = model.apply(variables, feats, r5,
                                          method=MaskRCNN.roi_bbox)
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), tgt)
            l_cls, l_reg = rcnn_loss(cls_logits, reg, flat)
            # mask head on the first pos_cap sampled rois per image —
            # the stable sampler puts every positive there (mmdet runs
            # positives-only; this is the static-shape equivalent)
            m5 = rois_flat(tgt["rois"][:, :pos_cap])
            mask_logits = model.apply(variables, feats, m5,
                                      method=MaskRCNN.roi_mask)
            M, C = mask_logits.shape[1], mask_logits.shape[-1]
            l_mask = jax.vmap(mask_loss)(
                mask_logits.reshape(B, pos_cap, M, M, C),
                tgt["rois"][:, :pos_cap], tgt["assigned_gt"][:, :pos_cap],
                tgt["labels"][:, :pos_cap], tgt["pos"][:, :pos_cap],
                batch["masks"]).mean()
            losses = {"rpn_cls": l_rpn_cls, "rpn_reg": l_rpn_reg,
                      "cls": l_cls, "reg": l_reg, "mask": l_mask,
                      "num_pos": tgt["pos"].sum()}
            total = l_rpn_cls + l_rpn_reg + l_cls + l_reg + l_mask
            return total, (losses, new_stats)

        (loss, (losses, new_stats)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt2, loss, losses

    @jax.jit
    def infer_stage1(params, bstats, images):
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
        feats = model.apply(variables, images, False,
                            method=MaskRCNN.features)
        rpn_cls, rpn_reg = model.apply(variables, feats,
                                       method=MaskRCNN.rpn)
        props, pscore = rpn_proposals(rpn_cls, rpn_reg, anchors, level_sizes,
                                      args.canvas,
                                      max_per_img=args.proposals)
        cls_logits, reg = model.apply(variables, feats, rois_flat(props),
                                      method=MaskRCNN.roi_bbox)
        B, R = props.shape[:2]
        return feats, props, cls_logits.reshape(B, R, -1), \
            reg.reshape(B, R, -1, 4)

    @jax.jit
    def infer_masks(params, bstats, feats, det_rois5):
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
        logits = model.apply(variables, feats, det_rois5,
                             method=MaskRCNN.roi_mask)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    def coco_evaluate():
        from cream_tpu.train.coco_eval import evaluate_detections
        ms = args.canvas // MASK_STRIDE
        gts, gts_m, dts, dts_m = {}, {}, {}, {}
        for bi, batch in enumerate(batches):
            feats, props, cls_logits, reg = infer_stage1(
                params, bstats, batch["image"])
            B = props.shape[0]
            for i in range(B):
                iid = int(np.asarray(batch["image_id"])[i]) \
                    if "image_id" in batch else bi * B + i
                det = mask_rcnn_decode(cls_logits[i], reg[i], props[i],
                                       args.canvas,
                                       max_per_img=args.max_dets)
                # mask head on the refined detections (padded static)
                D = len(det["boxes"])
                pad = np.zeros((args.max_dets, 5), np.float32)
                pad[:D, 0] = i
                pad[:D, 1:] = det["boxes"][:args.max_dets]
                probs = infer_masks(params, bstats, feats, jnp.asarray(pad))
                probs = np.asarray(probs)
                det_masks = np.zeros((D, ms, ms), bool)
                for d in range(min(D, args.max_dets)):
                    m28 = probs[d, :, :, int(det["labels"][d])]
                    det_masks[d] = paste_mask(m28, det["boxes"][d], ms)
                if "scaled_size" in batch:
                    sh, sw = np.asarray(batch["scaled_size"])[i]
                    oh, ow = np.asarray(batch["orig_size"])[i]
                    sc = np.asarray([ow / sw, oh / sh, ow / sw, oh / sh])
                else:
                    sc = np.ones(4)
                xyxy = det["boxes"] * sc
                dts[iid] = {"boxes": np.concatenate(
                    [xyxy[:, :2], xyxy[:, 2:] - xyxy[:, :2]], 1),
                    "labels": det["labels"], "scores": det["scores"],
                    "masks": det_masks}
                v = np.asarray(batch["valid"])[i]
                g_xyxy = np.asarray(batch["boxes"])[i][v] * sc
                gts[iid] = {"boxes": np.concatenate(
                    [g_xyxy[:, :2], g_xyxy[:, 2:] - g_xyxy[:, :2]], 1),
                    "labels": np.asarray(batch["labels"])[i][v],
                    "masks": np.asarray(batch["masks"])[i][v]}
        bbox = evaluate_detections(gts, dts, max_dets=args.max_dets)
        segm = evaluate_detections(gts, dts, max_dets=args.max_dets,
                                   mode="segm",
                                   mask_area_scale=MASK_STRIDE ** 2)
        metrics = {**{f"bbox_{k}": v for k, v in bbox.items()},
                   **{f"segm_{k}": v for k, v in segm.items()}}
        print("COCO eval:", {k: round(v, 4) for k, v in metrics.items()},
              flush=True)
        return metrics

    if args.eval_only:
        metrics = coco_evaluate()
        json.dump(metrics, open(args.out, "w"), indent=2)
        return {"metrics": metrics}

    rng = jax.random.key(args.seed + 1)
    history = []
    for step in range(args.steps):
        rng, sub = jax.random.split(rng)
        batch = batches[step % len(batches)]
        params, bstats, opt, loss, losses = train_step(params, bstats, opt,
                                                       batch, sub)
        rec = {"step": step, "total": float(loss),
               **{k: float(v) for k, v in losses.items()}}
        history.append(rec)
        print(f"step {step}: total {rec['total']:.3f} "
              f"rpn {rec['rpn_cls']:.3f}/{rec['rpn_reg']:.3f} "
              f"rcnn {rec['cls']:.3f}/{rec['reg']:.3f} "
              f"mask {rec['mask']:.3f} pos {int(rec['num_pos'])}",
              flush=True)

    assert np.isfinite(history[-1]["total"])
    result = {"history": history}
    result["metrics"] = coco_evaluate()
    json.dump(result, open(args.out, "w"), indent=2)
    print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
