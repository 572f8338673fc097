"""Teacher logits saver for fast distillation (TinyViT/save_logits.py).

Per epoch: run the teacher over the seeded-aug training set, store top-K
softmax probs + class indices + the aug seed per sample. `--check` re-reads
and verifies (the reference's --check-saved-logits determinism test,
save_logits.py:182-230).

The teacher MUST have real weights: pass --torch-ckpt (reference .pth, e.g.
the CLIP-ViT-L/14-22k teacher routed through convert_clip_classifier) or
--ckpt (an orbax checkpoint this framework trained). With a 22k-class
teacher, --remap-1kto22k applies the RemapLayer 22k->1k logits remap before
the softmax, like save_logits.py:30-31. Seeded pair mixup is applied to the
teacher inputs exactly as the distill train loop applies it to the student
(save_logits.py:120-121 / main.py:310-311) so both see identical pixels.

    python -m cream_tpu.cli.save_logits model.name=clip_vit_large14_224_classifier \
        model.num_classes=21841 --torch-ckpt clip_teacher_22k.pth \
        --remap-1kto22k imagenet_1kto22k.txt --out ./logits
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.core.config import Config
from cream_tpu.cli.train import build_dataset, build_train_transform
from cream_tpu.data.imagenet import train_loader
from cream_tpu.data.mixup import seeded_pair_mixup
from cream_tpu.distill import LogitsReader, LogitsWriter
from cream_tpu.models import create_model


def load_teacher_variables(cfg: Config, teacher, torch_ckpt, orbax_ckpt,
                           allow_random: bool):
    if torch_ckpt:
        from cream_tpu.zoo import load_model_variables
        return load_model_variables(cfg.model.name, torch_ckpt)
    if orbax_ckpt:
        from cream_tpu.core.checkpoint import restore_checkpoint
        x0 = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
        shapes = jax.eval_shape(teacher.init, jax.random.key(0), x0)
        from cream_tpu.train import TrainState
        import optax
        state = TrainState.create(
            params=jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes["params"]),
            tx=optax.identity(),
            batch_stats=jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                shapes.get("batch_stats", {})))
        state, _, _ = restore_checkpoint(orbax_ckpt, jax.eval_shape(lambda: state))
        out = {"params": state.params}
        if state.batch_stats:
            out["batch_stats"] = state.batch_stats
        return out
    if allow_random:
        x0 = jnp.zeros((cfg.data.batch_size, cfg.data.img_size,
                        cfg.data.img_size, 3))
        return jax.jit(teacher.init)(jax.random.key(0), x0)
    raise SystemExit(
        "refusing to save logits from a RANDOM-init teacher: pass "
        "--torch-ckpt or --ckpt (or --allow-random for smoke tests only). "
        "Random teacher logits would silently poison distillation.")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--out", default="teacher_logits")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference .pth teacher checkpoint")
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--remap-1kto22k", default=None,
                    help="imagenet_1kto22k.txt: remap 22k teacher logits to 1k")
    ap.add_argument("--allow-random", action="store_true",
                    help="smoke tests only: random-init teacher")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    dtype = getattr(jnp, cfg.model.dtype)
    teacher = create_model(cfg.model.name, num_classes=cfg.model.num_classes,
                           dtype=dtype, **cfg.model.extra)
    ds = build_dataset(cfg, train=True)
    variables = load_teacher_variables(cfg, teacher, args.torch_ckpt,
                                       args.ckpt, args.allow_random)
    K = cfg.distill.logits_topk
    num_out_classes = cfg.model.num_classes
    mapping = None
    if args.remap_1kto22k:
        from cream_tpu.zoo.remap import load_1k_to_22k
        mapping = jnp.asarray(load_1k_to_22k(args.remap_1kto22k))
        num_out_classes = int(mapping.shape[0])
    use_mixup = cfg.aug.mixup > 0 or cfg.aug.cutmix > 0
    transform = build_train_transform(cfg)

    @jax.jit
    def topk_probs(variables, images, seeds):
        if use_mixup:
            images, _ = seeded_pair_mixup(
                seeds, images, jnp.zeros((images.shape[0],), jnp.int32),
                num_out_classes, cfg.aug.mixup, cfg.aug.cutmix,
                cfg.aug.mixup_switch_prob, cfg.aug.label_smoothing)
        logits = teacher.apply(variables, images.astype(dtype))
        if mapping is not None:
            logits = logits[:, mapping]          # 22k -> 1k (zoo/remap.py)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
        vals, idxs = jax.lax.top_k(probs, K)
        return vals, idxs

    for epoch in range(args.epochs):
        if args.check:
            reader = LogitsReader(args.out, epoch)
            max_err, diff_rate, n = 0.0, 0.0, 0
            for batch in train_loader(ds, cfg.data.batch_size, epoch,
                                      cfg.train.seed, cfg.data.img_size,
                                      transform=transform):
                vals, idxs = topk_probs(variables,
                                        jnp.asarray(batch["image"]),
                                        jnp.asarray(batch["seed"]))
                sv, si, ss = reader.read_batch(batch["index"])
                assert (ss == batch["seed"]).all(), "seed mismatch!"
                max_err = max(max_err,
                              float(np.abs(np.asarray(vals) - sv).max()))
                diff_rate += float((np.asarray(idxs) != si).mean()) * len(sv)
                n += len(sv)
            print(f"epoch {epoch}: value max err {max_err:.4g}, "
                  f"index diff rate {diff_rate / max(n,1):.4g} over {n}")
        else:
            writer = LogitsWriter(args.out, epoch, len(ds), K, num_out_classes)
            for batch in train_loader(ds, cfg.data.batch_size, epoch,
                                      cfg.train.seed, cfg.data.img_size,
                                      transform=transform):
                vals, idxs = topk_probs(variables,
                                        jnp.asarray(batch["image"]),
                                        jnp.asarray(batch["seed"]))
                writer.write_batch(batch["index"], batch["seed"],
                                   np.asarray(vals), np.asarray(idxs))
            writer.close()
            print(f"epoch {epoch}: wrote {len(ds)} records to {args.out}")


if __name__ == "__main__":
    main()
