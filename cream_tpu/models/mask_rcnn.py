"""Mask R-CNN with the EfficientViT-FPN backbone — the reference's second
detection downstream (EfficientViT/downstream/configs/mask_rcnn_efficientvit
_m4_fpn_1x_coco.py), rebuilt framework-native on top of the same pieces as
RetinaNet (anchors/assigner/coder from models/retinanet.py, RoIAlign from
ops/detection.py).

Config mapping (the _base_/models/mask_rcnn_efficientvit_fpn.py tree):
  - neck: EfficientViTFPN with num_extra_trans_convs=2 -> five levels at
    strides {4, 8, 16, 32, 64}
  - rpn_head: RPNHead, 3 anchors/level (scale 8, ratios {.5, 1, 2}),
    sigmoid objectness + deltas; assigner pos .7 / neg .3 / min_pos .3;
    RandomSampler(256, pos_fraction .5); proposals: per-level pre-NMS top-k,
    joint NMS iou .7, top max_per_img
  - roi_head: SingleRoIExtractor (RoIAlign 7x7 over strides {4,8,16,32},
    level by floor(log2(sqrt(area)/56))), Shared2FCBBoxHead (2x fc 1024,
    softmax 80+bg, class-specific deltas with stds {.1,.1,.2,.2}),
    FCNMaskHead (4 convs + 2x deconv -> 28x28 per-class sigmoid masks);
    rcnn assigner pos/neg/min_pos .5, RandomSampler(512, .25,
    add_gt_as_proposals=True)

TPU-first: the whole two-stage train step is ONE jit — proposal NMS is the
static-shape scan NMS, RandomSampler becomes a randomized-priority top-k
(same marginal distribution), and the multi-level RoIAlign runs on every
level with a per-roi level mask (4x dense compute beats a gather). GT masks
ride at stride-4 canvas resolution and are cropped to 28x28 with the same
RoIAlign (mmdet crops at full image resolution — a quality-neutral
simplification documented here).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.models.registry import register_model
from cream_tpu.models.retinanet import (EfficientViTFPN, bbox2delta,
                                        delta2bbox, gen_base_anchors,
                                        grid_anchors, max_iou_assign)

Dtype = Any

MRCNN_STRIDES = (4, 8, 16, 32, 64)
ROI_STRIDES = (4, 8, 16, 32)
BBOX_STDS = np.asarray([0.1, 0.1, 0.2, 0.2], np.float32)


def mask_rcnn_anchors(canvas: int, strides=MRCNN_STRIDES) -> np.ndarray:
    """RPN anchors: scales [8], ratios {.5,1,2}, base_size = stride."""
    out = []
    for s in strides:
        base = gen_base_anchors(s, [8.0], (0.5, 1.0, 2.0))
        f = -(-canvas // s)
        out.append(grid_anchors(base, f, f, s))
    return np.concatenate(out, axis=0).astype(np.float32)


def mask_rcnn_anchor_levels(canvas: int, strides=MRCNN_STRIDES):
    return [(-(-canvas // s)) ** 2 * 3 for s in strides]


class RPNHead(nn.Module):
    """mmdet RPNHead: shared 3x3 conv + relu, 1x1 objectness (sigmoid) and
    1x1 4-delta heads, applied per level."""
    feat_channels: int = 256
    num_base_anchors: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> tuple:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name="rpn_conv")
        cls = nn.Conv(self.num_base_anchors, (1, 1), dtype=self.dtype,
                      name="rpn_cls")
        reg = nn.Conv(self.num_base_anchors * 4, (1, 1), dtype=self.dtype,
                      name="rpn_reg")
        co, ro = [], []
        for f in feats:
            h = nn.relu(conv(f))
            B, H, W, _ = f.shape
            co.append(cls(h).reshape(B, H * W * self.num_base_anchors))
            ro.append(reg(h).reshape(B, H * W * self.num_base_anchors, 4))
        return jnp.concatenate(co, axis=1), jnp.concatenate(ro, axis=1)


class BBoxHead(nn.Module):
    """Shared2FCBBoxHead: flatten 7x7x256 -> fc 1024 -> fc 1024 -> softmax
    (num_classes + 1 bg at the LAST index, mmdet v2) + class-specific reg."""
    num_classes: int = 80
    fc_channels: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> tuple:
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name="fc_cls")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                       name="fc_reg")(x)
        return cls, reg.reshape(-1, self.num_classes, 4)


class MaskHead(nn.Module):
    """FCNMaskHead: 4x (3x3 conv 256 + relu) -> 2x2 stride-2 deconv + relu
    -> 1x1 per-class mask logits (28x28 from 14x14 roi feats)."""
    num_classes: int = 80
    conv_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        x = roi_feats
        for i in range(4):
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f"conv_{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_channels, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_logits")(x)


class MaskRCNN(nn.Module):
    """Exposes the stage pieces as methods so the (host-free, fully jitted)
    train/infer drivers in cli/train_mask_rcnn.py can compose them."""
    backbone: nn.Module
    num_classes: int = 80
    fpn_channels: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.neck = EfficientViTFPN(self.fpn_channels,
                                    num_extra_trans_convs=2,
                                    dtype=self.dtype)
        self.rpn_head = RPNHead(self.fpn_channels, dtype=self.dtype)
        self.bbox_head = BBoxHead(self.num_classes, dtype=self.dtype)
        self.mask_head = MaskHead(self.num_classes, dtype=self.dtype)

    def features(self, images, train: bool = False):
        return self.neck(self.backbone.forward_pyramid(images, train))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_bbox(self, feats, rois):
        return self.bbox_head(multilevel_roi_align(feats, rois, 7))

    def roi_mask(self, feats, rois):
        return self.mask_head(multilevel_roi_align(feats, rois, 14))

    def __call__(self, images, train: bool = False):
        """Convenience forward: features + RPN outputs (init-time tracing
        also touches the roi heads with dummy rois so all params exist)."""
        feats = self.features(images, train)
        rpn_cls, rpn_reg = self.rpn(feats)
        if self.is_initializing():
            dummy = jnp.zeros((1, 5), jnp.float32)
            self.roi_bbox(feats, dummy)
            self.roi_mask(feats, dummy)
        return feats, rpn_cls, rpn_reg


def multilevel_roi_align(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                         out_size: int) -> jnp.ndarray:
    """SingleRoIExtractor: level = clamp(floor(log2(sqrt(wh)/56 + 1e-6)),
    0, 3) over strides {4,8,16,32}; every level is aligned densely and the
    per-roi level mask selects — static shapes, no gathers."""
    from cream_tpu.ops.detection import roi_align
    w = rois[:, 3] - rois[:, 1] + 1
    h = rois[:, 4] - rois[:, 2] + 1
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.clip(jnp.floor(jnp.log2(scale / 56.0 + 1e-6)), 0, 3
                   ).astype(jnp.int32)
    out = 0.0
    for i, stride in enumerate(ROI_STRIDES):
        al = roi_align(feats[i], rois, (out_size, out_size), 1.0 / stride,
                       sample_num=2)
        out = out + jnp.where((lvl == i)[:, None, None, None], al, 0.0)
    return out


def random_sample(rng, pos_mask, neg_mask, num: int, pos_fraction: float):
    """mmdet RandomSampler as randomized-priority top-k: up to
    num*pos_fraction positives (uniformly among positives), the rest
    negatives. Returns (idx (num,), is_pos (num,), valid (num,))."""
    n = pos_mask.shape[0]
    num_pos_cap = min(int(num * pos_fraction), n)    # top_k needs k <= n
    neg_k = min(num, n)
    r1, r2 = jax.random.split(rng)
    pos_pri = jnp.where(pos_mask, jax.random.uniform(r1, (n,)), -1.0)
    _, pos_idx = jax.lax.top_k(pos_pri, num_pos_cap)
    pos_ok = pos_pri[pos_idx] > 0
    n_pos = pos_ok.sum()
    neg_pri = jnp.where(neg_mask, jax.random.uniform(r2, (n,)), -1.0)
    _, neg_idx = jax.lax.top_k(neg_pri, neg_k)
    neg_ok = neg_pri[neg_idx] > 0
    # take n_pos positives then (num - n_pos) negatives
    take_neg = jnp.arange(neg_k) < (num - n_pos)
    idx = jnp.concatenate([pos_idx, neg_idx])
    keep = jnp.concatenate([pos_ok, neg_ok & take_neg])
    is_pos = jnp.concatenate([pos_ok, jnp.zeros(neg_k, bool)])
    if idx.shape[0] < num:                           # n < num: pad slots
        pad = num - idx.shape[0]
        idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)])
        keep = jnp.concatenate([keep, jnp.zeros(pad, bool)])
        is_pos = jnp.concatenate([is_pos, jnp.zeros(pad, bool)])
    order = jnp.argsort(~keep)                      # kept entries first
    idx = idx[order][:num]
    keep = keep[order][:num]
    is_pos = is_pos[order][:num]
    return idx, is_pos & keep, keep


def rpn_loss(rpn_cls, rpn_reg, anchors, gt_xyxy, gt_valid, rng,
             num_samples: int = 256):
    """Per-batch RPN loss: BCE objectness + L1 on sampled anchors
    (train_cfg.rpn: assigner .7/.3/.3, RandomSampler(256, .5))."""
    def one(cls_l, reg_l, gts, valid, key):
        assigned = max_iou_assign(anchors, gts, valid, pos_iou_thr=0.7,
                                  neg_iou_thr=0.3, min_pos_iou=0.3)
        idx, is_pos, keep = random_sample(key, assigned >= 0, assigned == -1,
                                          num_samples, 0.5)
        tgt = is_pos.astype(jnp.float32)
        logit = cls_l[idx]
        bce = optax_sigmoid_bce(logit, tgt)
        cls_loss = jnp.where(keep, bce, 0.0).sum() / \
            jnp.maximum(keep.sum(), 1)
        safe = jnp.maximum(assigned[idx], 0)
        deltas_t = bbox2delta(anchors[idx], gts[safe])
        l1 = jnp.abs(reg_l[idx] - deltas_t).sum(-1)
        reg_loss = jnp.where(is_pos, l1, 0.0).sum() / \
            jnp.maximum(keep.sum(), 1)
        return cls_loss, reg_loss

    keys = jax.random.split(rng, rpn_cls.shape[0])
    c, r = jax.vmap(one)(rpn_cls.astype(jnp.float32),
                         rpn_reg.astype(jnp.float32),
                         gt_xyxy, gt_valid, keys)
    return c.mean(), r.mean()


def optax_sigmoid_bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def rpn_proposals(rpn_cls, rpn_reg, anchors, level_sizes, canvas: int,
                  nms_pre: int = 500, max_per_img: int = 256,
                  iou_thr: float = 0.7):
    """train_cfg.rpn_proposal: per-level top-k, decode, clip, joint NMS.
    Static shapes; returns (B, max_per_img, 4) xyxy + validity scores."""
    from cream_tpu.ops.detection import nms

    def one(cls_l, reg_l):
        boxes_l, scores_l = [], []
        off = 0
        for n in level_sizes:
            k = min(nms_pre, n)
            s = cls_l[off:off + n]
            _, idx = jax.lax.top_k(s, k)
            boxes_l.append(delta2bbox(anchors[off:off + n][idx],
                                      reg_l[off:off + n][idx],
                                      max_shape=(canvas, canvas)))
            scores_l.append(s[idx])
            off += n
        boxes = jnp.concatenate(boxes_l)
        scores = jax.nn.sigmoid(jnp.concatenate(scores_l))
        keep_idx, keep_valid = nms(boxes, scores, iou_thr,
                                   max_outputs=max_per_img)
        props = boxes[keep_idx]
        return jnp.where(keep_valid[:, None], props, 0.0), \
            jnp.where(keep_valid, scores[keep_idx], 0.0)

    return jax.vmap(one)(rpn_cls.astype(jnp.float32),
                         rpn_reg.astype(jnp.float32))


@register_model(name="mask_rcnn_efficientvit_m4")
def mask_rcnn_efficientvit_m4(num_classes: int = 80, dtype=jnp.float32, **kw):
    from cream_tpu.models.efficientvit import _CONFIGS, EfficientViT
    bb = EfficientViT(num_classes=0, dtype=dtype, **_CONFIGS["efficientvit_m4"])
    return MaskRCNN(backbone=bb, num_classes=num_classes, dtype=dtype, **kw)


@register_model(name="mask_rcnn_efficientvit_m0")
def mask_rcnn_efficientvit_m0(num_classes: int = 80, dtype=jnp.float32, **kw):
    from cream_tpu.models.efficientvit import _CONFIGS, EfficientViT
    bb = EfficientViT(num_classes=0, dtype=dtype, **_CONFIGS["efficientvit_m0"])
    return MaskRCNN(backbone=bb, num_classes=num_classes, dtype=dtype, **kw)


def rcnn_stage(rng, proposals, prop_valid, gt_xyxy, gt_labels, gt_valid,
               num_classes: int, num: int = 128, pos_fraction: float = 0.25):
    """Per-image RCNN sampling + targets (train_cfg.rcnn: assigner
    pos/neg/min_pos .5, RandomSampler(num, .25, add_gt_as_proposals=True)).

    Returns dict with rois (num, 4), labels (num,) [bg = num_classes],
    reg_targets (num, 4) (std-normalized), pos/valid masks, assigned gt
    index per sampled roi (for mask targets)."""
    boxes = jnp.concatenate([gt_xyxy, proposals], axis=0)    # gts first
    valid = jnp.concatenate([gt_valid, prop_valid], axis=0)
    assigned = max_iou_assign(boxes, gt_xyxy, gt_valid, pos_iou_thr=0.5,
                              neg_iou_thr=0.5, min_pos_iou=0.5)
    pos_mask = (assigned >= 0) & valid
    neg_mask = (assigned == -1) & valid
    idx, is_pos, keep = random_sample(rng, pos_mask, neg_mask, num,
                                      pos_fraction)
    rois = boxes[idx]
    agt = jnp.maximum(assigned[idx], 0)
    labels = jnp.where(is_pos, gt_labels[agt], num_classes)
    labels = jnp.where(keep, labels, -1)                     # pad -> ignored
    deltas = bbox2delta(rois, gt_xyxy[agt]) / BBOX_STDS[None, :]
    return {"rois": rois, "labels": labels, "reg_targets": deltas,
            "pos": is_pos, "valid": keep, "assigned_gt": agt}


def rcnn_loss(cls_logits, reg, tgt):
    """Shared2FCBBoxHead losses: softmax CE over (C+1) with bg last,
    class-specific L1 on positives, both averaged over sampled rois
    (pos_weight -1 => 1.0)."""
    labels = tgt["labels"]
    valid = tgt["valid"]
    num_classes = reg.shape[1]
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    n = jnp.maximum(valid.sum(), 1)
    cls_loss = jnp.where(valid, ce, 0.0).sum() / n
    cls_reg = jnp.take_along_axis(
        reg.astype(jnp.float32),
        jnp.clip(safe, 0, num_classes - 1)[:, None, None].repeat(4, -1),
        axis=1)[:, 0]
    l1 = jnp.abs(cls_reg - tgt["reg_targets"]).sum(-1)
    reg_loss = jnp.where(tgt["pos"], l1, 0.0).sum() / n
    return cls_loss, reg_loss


def mask_loss(mask_logits, rois, assigned_gt, labels, pos, gt_masks_s4,
              mask_stride: int = 4):
    """FCNMaskHead BCE on the gt-class channel; targets are the gt masks
    (stride-4 canvas resolution) cropped to each positive roi at 28x28 with
    the same RoIAlign (mmdet crops at full resolution — quality-neutral at
    these mask sizes)."""
    from cream_tpu.ops.detection import roi_align
    M = mask_logits.shape[1]
    G = gt_masks_s4.shape[0]
    # gt masks as a (G, Hs, Ws, 1) feature stack; roi batch index = gt idx.
    # roi_align addresses index u at coordinate u, but a rasterized mask's
    # cell i covers image area [i, i+1) with its center at i+0.5 — shift the
    # roi by half a mask-stride so samples read cell centers, else every
    # boundary bin bleeds into the neighbouring zero cells.
    rois5 = jnp.concatenate(
        [assigned_gt[:, None].astype(jnp.float32),
         rois - 0.5 * mask_stride], axis=1)
    crop = roi_align(gt_masks_s4[..., None].astype(jnp.float32), rois5,
                     (M, M), 1.0 / mask_stride, sample_num=2)[..., 0]
    tgt = (crop >= 0.5).astype(jnp.float32)
    safe = jnp.clip(labels, 0, mask_logits.shape[-1] - 1)
    per_class = jnp.take_along_axis(
        mask_logits.astype(jnp.float32),
        safe[:, None, None, None].repeat(M, 1).repeat(M, 2), axis=3)[..., 0]
    bce = optax_sigmoid_bce(per_class, tgt).mean(axis=(1, 2))
    return jnp.where(pos, bce, 0.0).sum() / jnp.maximum(pos.sum(), 1)


def mask_rcnn_decode(cls_logits, reg, rois, canvas: int,
                     score_thr: float = 0.05, iou_thr: float = 0.5,
                     max_per_img: int = 100):
    """Per-image second-stage detections (bbox_head.get_det_bboxes):
    softmax scores (bg dropped), class-specific delta decode with the
    {.1,.1,.2,.2} stds, class-offset NMS."""
    from cream_tpu.ops.detection import nms
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[:, :-1]
    scores = probs.max(axis=1)
    labels = probs.argmax(axis=1)
    num_classes = reg.shape[1]
    cls_reg = jnp.take_along_axis(
        reg.astype(jnp.float32),
        jnp.clip(labels, 0, num_classes - 1)[:, None, None].repeat(4, -1),
        axis=1)[:, 0] * BBOX_STDS[None, :]
    boxes = delta2bbox(rois, cls_reg, max_shape=(canvas, canvas))
    scores = jnp.where(scores > score_thr, scores, 0.0)
    offset = labels.astype(jnp.float32)[:, None] * 1e5
    keep_idx, keep_valid = nms(boxes + offset, scores, iou_thr,
                               max_outputs=max_per_img)
    kidx = np.asarray(keep_idx)[np.asarray(keep_valid)]
    b = np.asarray(boxes)[kidx]
    s = np.asarray(scores)[kidx]
    l = np.asarray(labels)[kidx]
    sel = s > score_thr
    return {"boxes": b[sel], "scores": s[sel], "labels": l[sel],
            "roi_index": kidx[sel]}
