"""Semantic-segmentation training pieces: OHEM cross-entropy, the deep-
supervision loss composition, and confusion-matrix mIoU.

Rebuild of CDARTS/CDARTS_segmentation/tools/seg_opr/loss_opr.py
ProbOhemCrossEntropy2d (:46-96) and train/seg_metrics.py +
tools/utils/pyt_utils.py compute_hist, expressed as static-shape jittable
functions (the reference's boolean-mask indexing becomes sort + threshold +
masked mean — same selected pixel set, fixed shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ohem_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                       thresh: float = 0.7, min_kept: int = 1,
                       ignore: int = 255) -> jnp.ndarray:
    """Online hard example mining CE over NHWC logits / NHW int labels.

    Reference semantics (loss_opr.py:66-96): let p_i be the predicted
    probability of pixel i's target class. The kept set is the valid pixels
    with p_i <= max(thresh, k-th smallest p) where k = min_kept, i.e. at
    least min_kept hardest pixels, more if they are all confidently wrong.
    Returns the mean CE over kept pixels. Invalid (ignore) pixels get p = 1
    so they sort to the top and never enter the kept set; if fewer than
    min_kept valid pixels exist the threshold saturates at 1 and every valid
    pixel is kept (the reference's `min_kept > num_valid` fallthrough).
    """
    valid = labels != ignore
    tgt = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    prob = jnp.where(valid, jnp.exp(-ce), 1.0)
    flat = jnp.sort(prob.reshape(-1))
    k = min(max(int(min_kept), 1), flat.shape[0])
    threshold = jnp.maximum(flat[k - 1], thresh)
    kept = valid & (prob <= threshold)
    n = jnp.maximum(kept.sum(), 1)
    return jnp.where(kept, ce, 0.0).sum() / n


def cydas_seg_loss(preds, labels, min_kept: int, thresh: float = 0.7,
                   ignore: int = 255, aux_weight: float = 0.2):
    """Deep-supervision composition (train_cydas.py:415-423): OHEM on the
    main 1/8-path prediction plus `lamb`-weighted OHEM on the two aux
    heads."""
    pred8, pred16, pred32 = preds
    loss8 = ohem_cross_entropy(pred8, labels, thresh, min_kept, ignore)
    loss16 = ohem_cross_entropy(pred16, labels, thresh, min_kept, ignore)
    loss32 = ohem_cross_entropy(pred32, labels, thresh, min_kept, ignore)
    return loss8 + aux_weight * (loss16 + loss32), {
        "loss8": loss8, "loss16": loss16, "loss32": loss32}


def seg_confusion(pred: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
                  ignore: int = 255) -> jnp.ndarray:
    """(C, C) confusion histogram hist[t, p] over valid pixels
    (pyt_utils.compute_hist). Accumulate across batches then reduce with
    miou_from_hist; under a device mesh the hist is psum-able."""
    valid = labels != ignore
    t = jnp.where(valid, labels, 0).reshape(-1)
    p = pred.reshape(-1)
    idx = t * num_classes + p
    hist = jnp.zeros((num_classes * num_classes,), jnp.float32)
    hist = hist.at[idx].add(valid.reshape(-1).astype(jnp.float32))
    return hist.reshape(num_classes, num_classes)


def miou_from_hist(hist: jnp.ndarray) -> tuple:
    """(mIoU, per-class IoU) — classes never seen (row+col empty) give nan
    in the reference's numpy divide; we follow train_cydas.py:508-509 and
    average over classes with any presence."""
    inter = jnp.diag(hist)
    union = hist.sum(0) + hist.sum(1) - inter
    iou = inter / jnp.maximum(union, 1e-12)
    present = union > 0
    miou = (iou * present).sum() / jnp.maximum(present.sum(), 1)
    return miou, iou


def batch_intersection_union(pred: jnp.ndarray, labels: jnp.ndarray,
                             num_classes: int, ignore: int = 255) -> tuple:
    """Per-class (intersection, union) vectors (seg_metrics.py
    batch_intersection_union) — the train-loop running-mIoU metric."""
    hist = seg_confusion(pred, labels, num_classes, ignore)
    inter = jnp.diag(hist)
    union = hist.sum(0) + hist.sum(1) - inter
    return inter, union
