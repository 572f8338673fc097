"""RetinaNet with an EfficientViT-FPN backbone — the reference's detection
downstream (EfficientViT/downstream/configs/retinanet_efficientvit_m4_fpn_
1x_coco.py) as a framework-native model.

Pieces and their reference sources:
  - anchors: vendored mmdet AnchorGenerator (CDARTS_detection/mmdet/core/
    anchor/anchor_generator.py) — legacy (w-1)/2 centers, rounded base
    anchors; RetinaHead octave scales 4 * 2^(i/3), ratios {.5, 1, 2},
    strides {8, 16, 32, 64, 128} (retina_head.py:19-35, anchor_head.py:36-38)
  - neck: EfficientViTFPN (downstream/efficientvit_fpn.py) — 1x1 laterals
    on the three backbone stages (strides 16/32/64), top-down adds, one
    2x transposed-conv extra lateral for the stride-8 level, 3x3 fpn convs,
    and a 1x1/stride-2 max-pool top level (add_extra_convs=False path)
  - head: RetinaHead — 4 shared 3x3 conv towers for cls/reg, sigmoid focal
    classification (bias init -log(0.99/0.01)), per-anchor box deltas
  - targets: MaxIoUAssigner (pos>=.5, neg<.4, min_pos_iou 0 with
    gt-max rescue, max_iou_assigner.py:93-147) + DeltaXYWHBBoxCoder
    (bbox2delta/delta2bbox with the legacy +1 sizes, transforms.py:6-70),
    all expressed as static-shape jit math (argmax assignment — no host
    round-trip, unlike DETR's Hungarian matching)
  - losses: sigmoid focal (exact kernel port in train/detection.py) + L1,
    both averaged by the positive count.

TPU-first: fixed canvas => fixed anchor set folded into the jit as a
constant; assignment/training are one jit; inference keeps static
shapes (per-level top-k, fixed-size class-wise NMS via ops.detection.nms).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.models.registry import register_model

Dtype = Any

RETINA_STRIDES = (8, 16, 32, 64, 128)


# ------------------------------------------------------------------ anchors

def gen_base_anchors(base_size: int, scales, ratios) -> np.ndarray:
    """anchor_generator.py:18-43 (legacy centers, rounded)."""
    w = h = float(base_size)
    x_ctr = 0.5 * (w - 1)
    y_ctr = 0.5 * (h - 1)
    ratios = np.asarray(ratios, np.float32)
    scales = np.asarray(scales, np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
    return np.round(np.stack([
        x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
        x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)], axis=-1))


def grid_anchors(base: np.ndarray, feat_h: int, feat_w: int, stride: int
                 ) -> np.ndarray:
    """anchor_generator.py:52-68: shifts row-major, anchors fastest."""
    sx = np.arange(feat_w) * stride
    sy = np.arange(feat_h) * stride
    xx = np.tile(sx, feat_h)
    yy = np.repeat(sy, feat_w)
    shifts = np.stack([xx, yy, xx, yy], axis=-1).astype(np.float32)
    return (base[None, :, :] + shifts[:, None, :]).reshape(-1, 4)


def retina_anchors(canvas: int, strides=RETINA_STRIDES,
                   octave_base_scale: int = 4, scales_per_octave: int = 3,
                   ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """All-level anchor set for a square canvas (host constant)."""
    scales = octave_base_scale * np.array(
        [2 ** (i / scales_per_octave) for i in range(scales_per_octave)])
    out = []
    for s in strides:
        base = gen_base_anchors(s, scales, ratios)   # base_size = stride
        f = -(-canvas // s)
        out.append(grid_anchors(base, f, f, s))
    return np.concatenate(out, axis=0).astype(np.float32)


def anchors_per_level(canvas: int, strides=RETINA_STRIDES, num_base: int = 9):
    return [(-(-canvas // s)) ** 2 * num_base for s in strides]


# -------------------------------------------------------------------- coder

def bbox2delta(proposals, gt):
    """transforms.py:6-31 (means 0, stds 1, legacy +1 sizes)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    return jnp.stack([(gx - px) / pw, (gy - py) / ph,
                      jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)


def delta2bbox(rois, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
    """transforms.py:34-70."""
    dx, dy, dw, dh = (deltas[..., 0], deltas[..., 1],
                      deltas[..., 2], deltas[..., 3])
    max_ratio = abs(np.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0] + 1.0
    ph = rois[..., 3] - rois[..., 1] + 1.0
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5 + 0.5
    y1 = gy - gh * 0.5 + 0.5
    x2 = gx + gw * 0.5 - 0.5
    y2 = gy + gh * 0.5 - 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# ----------------------------------------------------------------- assigner

def max_iou_assign(anchors, gt_xyxy, gt_valid, pos_iou_thr: float = 0.5,
                   neg_iou_thr: float = 0.4, min_pos_iou: float = 0.0):
    """MaxIoUAssigner.assign_wrt_overlaps (max_iou_assigner.py:93-147) in
    static-shape form. Returns assigned gt index per anchor: -2 = ignore
    band, -1 = negative, >=0 = gt index. Legacy +1 IoU like geometry.py."""
    from cream_tpu.ops.detection import iou_matrix
    ious = iou_matrix(anchors, gt_xyxy, legacy_plus1=True)          # (A, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_iou = ious.max(axis=1)
    argmax = ious.argmax(axis=1)
    assigned = jnp.full(anchors.shape[0], -2, jnp.int32)     # -1 default (dc)
    assigned = jnp.where((max_iou >= 0) & (max_iou < neg_iou_thr),
                         -1, assigned)                       # negatives
    assigned = jnp.where(max_iou >= pos_iou_thr, argmax, assigned)
    # step 4: each gt's best anchor(s) become positive for that gt
    # (gt_max_assign_all=True: every anchor tying the gt's max IoU)
    gt_max = ious.max(axis=0)                                # (G,)
    is_gt_best = (ious == gt_max[None, :]) & (gt_max[None, :] >= min_pos_iou) \
        & gt_valid[None, :] & (gt_max[None, :] > 0)
    # later gts override earlier ones, like the python loop's ordering
    gidx = jnp.arange(gt_xyxy.shape[0])
    best_gt = jnp.where(is_gt_best, gidx[None, :], -1).max(axis=1)
    assigned = jnp.where(best_gt >= 0, best_gt, assigned)
    return assigned


# ------------------------------------------------------------------ modules

class EfficientViTFPN(nn.Module):
    """efficientvit_fpn.py forward (:190-264): laterals, top-down, one
    transposed-conv stride-8 extra lateral + its 3x3 conv, 3x3 fpn convs,
    max-pool top level."""
    out_channels: int = 256
    num_extra_trans_convs: int = 1
    num_outs: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> tuple:
        n = len(feats)
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lateral_{i}")(feats[i]) for i in range(n)]
        for i in range(n - 1, 0, -1):
            up = jax.image.resize(laterals[i], laterals[i - 1].shape,
                                  method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        extra_laterals = []
        prev = laterals[0]
        for i in range(self.num_extra_trans_convs):
            t = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                                 dtype=self.dtype,
                                 name=f"extra_trans_{i}")(prev)
            extra_laterals.insert(0, t)
            prev = t
        outs = [nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"fpn_{i}")(laterals[i])
                for i in range(n)]
        while len(outs) + len(extra_laterals) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        extra_outs = [nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                              dtype=self.dtype, name=f"extra_fpn_{i}")(t)
                      for i, t in enumerate(extra_laterals)]
        return tuple(extra_outs + outs)


class RetinaHead(nn.Module):
    """retina_head.py: 4 shared conv towers, sigmoid-focal cls head
    (bias -log(0.99/0.01)), 4-delta reg head, applied per level."""
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    num_base_anchors: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> tuple:
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f"cls_conv_{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f"reg_conv_{i}")
                     for i in range(self.stacked_convs)]
        cls_head = nn.Conv(self.num_base_anchors * self.num_classes, (3, 3),
                           padding=[(1, 1)] * 2, dtype=self.dtype,
                           bias_init=nn.initializers.constant(
                               -float(np.log((1 - 0.01) / 0.01))),
                           name="retina_cls")
        reg_head = nn.Conv(self.num_base_anchors * 4, (3, 3),
                           padding=[(1, 1)] * 2, dtype=self.dtype,
                           name="retina_reg")
        cls_out, reg_out = [], []
        for f in feats:
            c = r = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            B, H, W, _ = f.shape
            cls_out.append(cls_head(c).reshape(
                B, H * W * self.num_base_anchors, self.num_classes))
            reg_out.append(reg_head(r).reshape(
                B, H * W * self.num_base_anchors, 4))
        return (jnp.concatenate(cls_out, axis=1),
                jnp.concatenate(reg_out, axis=1))


class RetinaNet(nn.Module):
    """backbone.forward_pyramid -> EfficientViTFPN -> RetinaHead.
    Returns (cls_logits (B, A, C), deltas (B, A, 4)); anchors come from
    retina_anchors(canvas) on the host."""
    backbone: nn.Module
    num_classes: int = 80
    fpn_channels: int = 256
    # 1 for stride-16/32/64 backbones (EfficientViT: transposed conv adds the
    # stride-8 level); 0 for stride-8/16/32 backbones (Cream/DARTS: max-pool
    # extends the top instead) — both yield P3..P7 at RETINA_STRIDES.
    fpn_extra_trans: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> tuple:
        feats = self.backbone.forward_pyramid(images, train)
        feats = EfficientViTFPN(self.fpn_channels,
                                num_extra_trans_convs=self.fpn_extra_trans,
                                dtype=self.dtype, name="neck")(feats)
        return RetinaHead(self.num_classes, self.fpn_channels,
                          dtype=self.dtype, name="bbox_head")(feats)


# ------------------------------------------------------------------- losses

def retinanet_loss(cls_logits, deltas, anchors, gt_xyxy, gt_labels, gt_valid,
                   num_classes: int):
    """Per-batch focal + L1 with mmdet Retina target semantics: labels are
    1-based for the focal kernel (0 = background), ignore band (-2) drops
    out of both losses; averaged by the positive count
    (anchor_head.py loss with sampling=False)."""
    from cream_tpu.train.detection import sigmoid_focal_loss

    def one(cls_l, dlt, gts, labels, valid):
        assigned = max_iou_assign(anchors, gts, valid)       # (A,)
        pos = assigned >= 0
        safe = jnp.maximum(assigned, 0)
        tgt_label = jnp.where(pos, labels[safe] + 1, 0)      # 1-based fg
        tgt_label = jnp.where(assigned == -2, -1, tgt_label)  # ignore band
        focal = sigmoid_focal_loss(cls_l.astype(jnp.float32), tgt_label)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        cls_loss = focal.sum() / num_pos
        tgt_delta = bbox2delta(anchors, gts[safe])
        l1 = jnp.abs(dlt.astype(jnp.float32) - tgt_delta).sum(-1)
        box_loss = jnp.where(pos, l1, 0.0).sum() / num_pos
        return cls_loss, box_loss, pos.sum()

    cls_loss, box_loss, npos = jax.vmap(one)(
        cls_logits, deltas, gt_xyxy, gt_labels, gt_valid)
    return {"loss_cls": cls_loss.mean(), "loss_bbox": box_loss.mean(),
            "num_pos": npos.sum()}


def retinanet_decode(cls_logits, deltas, anchors, level_sizes,
                     score_thr: float = 0.05, nms_pre: int = 1000,
                     iou_thr: float = 0.5, max_per_img: int = 100):
    """Per-image detections (anchor_head.get_bboxes semantics): per-level
    top-k by max-class score, decode, class-agnostic-offset NMS trick for
    class-wise NMS, top max_per_img. Static shapes; host-side glue returns
    numpy dict per image."""
    from cream_tpu.ops.detection import nms

    B = cls_logits.shape[0]
    probs = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    out = []
    for b in range(B):
        boxes_l, scores_l, labels_l = [], [], []
        off = 0
        for n in level_sizes:
            p = probs[b, off:off + n]                        # (n, C)
            d = deltas[b, off:off + n]
            a = anchors[off:off + n]
            k = min(nms_pre, n)
            best = p.max(axis=1)
            _, idx = jax.lax.top_k(best, k)
            boxes_l.append(delta2bbox(a[idx], d[idx]))
            scores_l.append(p[idx].max(axis=1))
            labels_l.append(p[idx].argmax(axis=1))
            off += n
        boxes = jnp.concatenate(boxes_l)
        scores = jnp.concatenate(scores_l)
        labels = jnp.concatenate(labels_l)
        keep_mask = scores > score_thr
        scores = jnp.where(keep_mask, scores, 0.0)
        # class-offset trick: shift boxes per class so NMS is class-wise
        offset = labels.astype(jnp.float32)[:, None] * 1e5
        keep_idx, keep_valid = nms(boxes + offset, scores, iou_thr,
                                   max_outputs=max_per_img)
        kidx = np.asarray(keep_idx)[np.asarray(keep_valid)]
        b_np = np.asarray(boxes)[kidx]
        s_np = np.asarray(scores)[kidx]
        l_np = np.asarray(labels)[kidx]
        pos = s_np > score_thr
        out.append({"boxes": b_np[pos], "scores": s_np[pos],
                    "labels": l_np[pos]})
    return out


@register_model(name="retinanet_efficientvit_m4")
def retinanet_efficientvit_m4(num_classes: int = 80, dtype=jnp.float32, **kw):
    from cream_tpu.models.efficientvit import _CONFIGS, EfficientViT
    bb = EfficientViT(num_classes=0, dtype=dtype, **_CONFIGS["efficientvit_m4"])
    return RetinaNet(backbone=bb, num_classes=num_classes, dtype=dtype, **kw)


@register_model(name="retinanet_efficientvit_m0")
def retinanet_efficientvit_m0(num_classes: int = 80, dtype=jnp.float32, **kw):
    from cream_tpu.models.efficientvit import _CONFIGS, EfficientViT
    bb = EfficientViT(num_classes=0, dtype=dtype, **_CONFIGS["efficientvit_m0"])
    return RetinaNet(backbone=bb, num_classes=num_classes, dtype=dtype, **kw)


@register_model(name="retinanet_cream")
def retinanet_cream(arch="cream_604", num_classes: int = 80,
                    dtype=jnp.float32, **kw):
    """RetinaNet over a Cream-searched childnet backbone — the composition
    the reference provides as CDARTS_detection (NAS mobile backbones into
    mmdet FPN+RetinaNet, CDARTS/CDARTS_detection/mmdet/models/backbones/).
    `arch`: a released name (cream_14..604), per-stage choice tuples, or the
    flat supernet form straight out of evolution/cream search."""
    from cream_tpu.models.cream import (RELEASED_CHILDNETS, CreamChildNet,
                                        nest_arch)
    released = isinstance(arch, str)
    if released:
        arch = RELEASED_CHILDNETS[arch]
    else:
        arch = tuple(arch)
        if arch and not isinstance(arch[0], (tuple, list)):
            arch = nest_arch(arch)
        arch = tuple(tuple(s) for s in arch)
    bb = CreamChildNet(arch=arch, released_quirk=released, dtype=dtype)
    return RetinaNet(backbone=bb, num_classes=num_classes,
                     fpn_extra_trans=0, dtype=dtype, **kw)


@register_model(name="retinanet_cdarts")
def retinanet_cdarts(genotypes, num_classes: int = 80, dtype=jnp.float32,
                     init_channels: int = 48, **kw):
    """RetinaNet over a CDARTS retrain backbone (per-group genotypes as in
    cdarts_retrain_imagenet / cells/*.json)."""
    from cream_tpu.models.darts import CDARTSRetrain, genotype_from_str
    if isinstance(genotypes, dict):
        genotypes = [genotypes[k] for k in sorted(genotypes, key=int)]
    genotypes = tuple(genotype_from_str(g) if isinstance(g, str) else g
                      for g in genotypes)
    bb = CDARTSRetrain(genotypes=genotypes, model_type="imagenet",
                       init_channels=init_channels, dtype=dtype)
    return RetinaNet(backbone=bb, num_classes=num_classes,
                     fpn_extra_trans=0, dtype=dtype, **kw)
