"""Zero-shot ImageNet classification for CLIP models.

Rebuild of TinyCLIP/src/training/zero_shot.py: build a classifier from
class-name/template text embeddings (template-averaged, L2-normalized), then
top-1/top-5 over image embeddings. The reference shards the classifier build
across ranks then all_gathers (:50-62); here the text forward is one jitted
batched call — the mesh shards it automatically when templates*classes is
large.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# the 80 OpenAI prompt templates are public constants; a minimal high-signal
# subset is bundled inline, and the FULL 80-template + 1000-classname set
# (which the reference accuracies depend on) ships as a data file —
# data/zero_shot_constants.json, use openai_imagenet_constants().
DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a photo of the {}.",
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a close-up photo of a {}.",
    "a black and white photo of a {}.",
    "itap of a {}.",
    "a low resolution photo of a {}.",
)


def openai_imagenet_constants() -> tuple[list, list]:
    """(classnames, templates): the full public OpenAI CLIP ImageNet
    zero-shot set (1000 names, 80 prompt templates) — exact reference parity
    for the published zero-shot numbers."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "zero_shot_constants.json")
    with open(path) as fh:
        d = json.load(fh)
    return d["classnames"], d["templates"]


def build_zero_shot_classifier(encode_text_fn, tokenizer, classnames,
                               templates=DEFAULT_TEMPLATES,
                               batch_size: int = 64, mesh=None) -> jnp.ndarray:
    """-> (embed_dim, num_classes) classifier, template-averaged + normalized.

    With `mesh`, each chunk's token batch is sharded over the 'data' axis so
    every device encodes a slice of the class/template texts — the mesh form
    of the reference's rank-sharded build + all_gather
    (TinyCLIP/src/training/zero_shot.py:50-62). Token rows are zero-padded
    to a device multiple and the padding is sliced off after encoding.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sharding = NamedSharding(mesh, P("data"))
        n_dev = mesh.devices.size
    weights = []
    for i in range(0, len(classnames), batch_size):
        chunk = classnames[i:i + batch_size]
        texts = [t.format(c) for c in chunk for t in templates]
        tokens = np.asarray(tokenizer(texts))
        rows = tokens.shape[0]
        if mesh is not None:
            pad = (-rows) % n_dev
            if pad:
                tokens = np.concatenate(
                    [tokens, np.zeros((pad,) + tokens.shape[1:],
                                      tokens.dtype)], axis=0)
            tokens = jax.device_put(tokens, data_sharding)
        emb = encode_text_fn(jnp.asarray(tokens))[:rows]     # (C*T, D) normalized
        emb = emb.reshape(len(chunk), len(templates), -1).mean(axis=1)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        weights.append(emb)
    return jnp.concatenate(weights, axis=0).T                # (D, C)


def zero_shot_eval(encode_image_fn, classifier: jnp.ndarray, batches) -> dict:
    """batches yield {'image': NHWC, 'label': (B,)}; returns top1/top5 (%)."""
    top1 = top5 = n = 0
    for batch in batches:
        feats = encode_image_fn(batch["image"])              # (B, D) normalized
        logits = feats @ classifier                           # (B, C)
        labels = np.asarray(batch["label"])
        pred5 = np.asarray(jax.lax.top_k(logits, 5)[1])
        top1 += int((pred5[:, 0] == labels).sum())
        top5 += int((pred5 == labels[:, None]).any(-1).sum())
        n += len(labels)
    return {"zeroshot_top1": 100.0 * top1 / max(n, 1),
            "zeroshot_top5": 100.0 * top5 / max(n, 1), "n": n}
