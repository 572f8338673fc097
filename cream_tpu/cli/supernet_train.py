"""AutoFormer supernet training CLI (AutoFormer/supernet_train.py --mode super).

    python -m cream_tpu.cli.supernet_train --space tiny data.dataset=synthetic \
        data.batch_size=32 train.epochs=2

Every batch trains a uniformly-sampled subnet through the masked supernet
(single compile for the whole space). Mirrors the reference trainer's
features (supernet_train.py:186-397): optional frozen-teacher KD
(distill.kind=soft|hard with distill.teacher + --teacher-torch-ckpt), EMA
(train.ema_decay), and auto-resume from the newest checkpoint.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.core.checkpoint import (
    latest_step, restore_checkpoint, save_checkpoint)
from cream_tpu.core.config import Config
from cream_tpu.cli.train import build_dataset
from cream_tpu.data.imagenet import train_loader
from cream_tpu.models import create_model
from cream_tpu.models.autoformer import SPACES, encode_config, sample_config
from cream_tpu.nas.supernet_engine import (
    make_supernet_train_step, train_supernet_epoch)
from cream_tpu.train import TrainState, cosine_schedule, make_adamw


def build_teacher_apply(cfg: Config, dtype, torch_ckpt: str | None):
    """Frozen teacher forward for KD (supernet_engine.py:66-71)."""
    teacher = create_model(cfg.distill.teacher,
                           num_classes=cfg.model.num_classes, dtype=dtype)
    if torch_ckpt:
        from cream_tpu.zoo import load_model_variables
        tv = load_model_variables(cfg.distill.teacher, torch_ckpt)
    else:
        x0 = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3), dtype)
        tv = jax.jit(teacher.init)(jax.random.key(1), x0)
        print("WARNING: teacher is random-init (no --teacher-torch-ckpt) — "
              "KD signal is noise; use for smoke tests only")
    return lambda images: teacher.apply(tv, images)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--space", default="tiny", choices=list(SPACES))
    ap.add_argument("--teacher-torch-ckpt", default=None)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    space = SPACES[args.space]
    dtype = getattr(jnp, cfg.model.dtype)
    model = create_model(f"autoformer_supernet_{args.space}",
                         num_classes=cfg.model.num_classes, dtype=dtype)
    ds = build_dataset(cfg, train=True)
    steps_per_epoch = max(len(ds) // cfg.data.batch_size, 1)

    x0 = jnp.zeros((cfg.data.batch_size, cfg.data.img_size,
                    cfg.data.img_size, 3), dtype)
    enc0 = encode_config(sample_config(np.random.default_rng(0), space), space)
    variables = jax.jit(model.init)(jax.random.key(cfg.train.seed), x0, enc0)

    sched = cosine_schedule(cfg.train.base_lr,
                            cfg.train.warmup_epochs * steps_per_epoch,
                            steps_per_epoch * cfg.train.epochs,
                            cfg.train.warmup_lr, cfg.train.min_lr)
    tx = make_adamw(sched, cfg.train.weight_decay,
                    clip_grad=cfg.train.clip_grad, params=variables["params"])
    state = TrainState.create(params=variables["params"], tx=tx,
                              ema_decay=cfg.train.ema_decay)

    ckpt_dir = f"{cfg.output}/autoformer_supernet_{args.space}/{cfg.tag}/ckpt"
    start_epoch = 0
    if cfg.train.auto_resume and latest_step(ckpt_dir) is not None:
        state, extra, step = restore_checkpoint(ckpt_dir,
                                                jax.eval_shape(lambda: state))
        start_epoch = (extra or {}).get("epoch", 0) + 1
        print(f"auto-resumed from step {step} (epoch {start_epoch})")

    teacher_apply = None
    if cfg.distill.kind != "none" and cfg.distill.teacher:
        teacher_apply = build_teacher_apply(cfg, dtype, args.teacher_torch_ckpt)
    step = make_supernet_train_step(model, teacher_apply=teacher_apply,
                                    distill_kind=cfg.distill.kind,
                                    alpha=cfg.distill.alpha,
                                    tau=cfg.distill.tau)

    for epoch in range(start_epoch, cfg.train.epochs):
        t0 = time.time()

        def batches():
            from cream_tpu.data.imagenet import prefetch
            dshard = ((jax.process_index(), jax.process_count())
                      if jax.process_count() > 1 else None)
            for b in prefetch(train_loader(ds, cfg.data.batch_size, epoch,
                                           cfg.train.seed, cfg.data.img_size,
                                           cfg.data.num_workers,
                                           shard=dshard)):
                yield {"image": jnp.asarray(b["image"], dtype),
                       "label": jnp.asarray(b["label"])}

        state, losses = train_supernet_epoch(state, step, batches(), space,
                                             epoch, cfg.train.seed)
        print(f"epoch {epoch}: mean loss {np.mean(losses):.4f} "
              f"({time.time()-t0:.1f}s)")
        save_checkpoint(ckpt_dir, int(state.step), state,
                        extra={"epoch": epoch})
    return ckpt_dir


if __name__ == "__main__":
    main()
