"""Teacher logits saver for fast distillation (TinyViT/save_logits.py).

Per epoch: run the teacher over the seeded-aug training set, store top-K
softmax probs + class indices + the aug seed per sample. `--check` re-reads
and verifies (the reference's --check-saved-logits determinism test).

    python -m cream_tpu.cli.save_logits model.name=clip_vit_b_16_classifier ...
    python -m cream_tpu.cli.save_logits model.name=tiny_vit_21m_224 \
        data.dataset=synthetic distill.logits_topk=10 --epochs 2 --out /tmp/logits
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.core.config import Config
from cream_tpu.cli.train import build_dataset
from cream_tpu.data.imagenet import train_loader
from cream_tpu.distill import LogitsReader, LogitsWriter
from cream_tpu.models import create_model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--out", default="teacher_logits")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    dtype = getattr(jnp, cfg.model.dtype)
    teacher = create_model(cfg.model.name, num_classes=cfg.model.num_classes,
                           dtype=dtype, **cfg.model.extra)
    ds = build_dataset(cfg, train=True)
    x0 = jnp.zeros((cfg.data.batch_size, cfg.data.img_size,
                    cfg.data.img_size, 3), dtype)
    variables = jax.jit(teacher.init)(jax.random.key(0), x0)
    # TODO: load teacher weights (torch importer / orbax) when provided
    K = cfg.distill.logits_topk

    @jax.jit
    def topk_probs(variables, images):
        probs = jax.nn.softmax(
            teacher.apply(variables, images).astype(jnp.float32), -1)
        vals, idxs = jax.lax.top_k(probs, K)
        return vals, idxs

    for epoch in range(args.epochs):
        if args.check:
            reader = LogitsReader(args.out, epoch)
            max_err, diff_rate, n = 0.0, 0.0, 0
            for batch in train_loader(ds, cfg.data.batch_size, epoch,
                                      cfg.train.seed, cfg.data.img_size):
                vals, idxs = topk_probs(variables,
                                        jnp.asarray(batch["image"], dtype))
                sv, si, ss = reader.read_batch(batch["index"])
                assert (ss == batch["seed"]).all(), "seed mismatch!"
                max_err = max(max_err,
                              float(np.abs(np.asarray(vals) - sv).max()))
                diff_rate += float((np.asarray(idxs) != si).mean()) * len(sv)
                n += len(sv)
            print(f"epoch {epoch}: value max err {max_err:.4g}, "
                  f"index diff rate {diff_rate / max(n,1):.4g} over {n}")
        else:
            writer = LogitsWriter(args.out, epoch, len(ds), K,
                                  cfg.model.num_classes)
            for batch in train_loader(ds, cfg.data.batch_size, epoch,
                                      cfg.train.seed, cfg.data.img_size):
                vals, idxs = topk_probs(variables,
                                        jnp.asarray(batch["image"], dtype))
                writer.write_batch(batch["index"], batch["seed"],
                                   np.asarray(vals), np.asarray(idxs))
            writer.close()
            print(f"epoch {epoch}: wrote {len(ds)} records to {args.out}")


if __name__ == "__main__":
    main()
