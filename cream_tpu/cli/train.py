"""Classification training CLI — the unified replacement for the per-project
main.py trainers (TinyViT/main.py, EfficientViT/classification/main.py,
MiniViT mains, AutoFormer supernet_train.py retrain mode, ...).

    python -m cream_tpu.cli.train --cfg cfg.yaml [KEY=VALUE ...]
    python -m cream_tpu.cli.train model.name=efficientvit_m0 data.dataset=synthetic \
        train.epochs=1 data.batch_size=32

Data parallelism comes from the device mesh automatically; no launcher, no
process-per-device (the torch.distributed.launch equivalent is: nothing).
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.core.checkpoint import (
    AsyncCheckpointer, latest_step, restore_checkpoint)
from cream_tpu.core.config import Config
from cream_tpu.core.mesh import create_mesh, init_distributed, shard_batch
from cream_tpu.data.imagenet import (
    ImageFolder, SyntheticDataset, ZipImageFolder, eval_loader, prefetch,
    train_loader)
from cream_tpu.data.mixup import mixup_cutmix
from cream_tpu.models import create_model
from cream_tpu.train import (
    MetricLogger, TrainState, cosine_schedule, make_adamw, make_eval_step,
    make_train_step, topk_accuracy_counts)
from cream_tpu.train.losses import soft_target_ce


def build_train_transform(cfg: Config):
    """Full deterministic aug pipeline from the config (shared by the train
    and save_logits CLIs so teacher and student see identical pixels)."""
    from cream_tpu.data.det_aug import TrainAugConfig, make_train_transform
    return make_train_transform(TrainAugConfig(
        img_size=cfg.data.img_size, hflip=cfg.aug.hflip,
        color_jitter=cfg.aug.color_jitter, auto_augment=cfg.aug.auto_augment,
        reprob=cfg.aug.reprob, remode=cfg.aug.remode,
        recount=cfg.aug.recount))


def build_dataset(cfg: Config, train: bool):
    if cfg.data.dataset == "synthetic":
        return SyntheticDataset(n=max(4 * cfg.data.batch_size, 64),
                                img_size=cfg.data.img_size,
                                num_classes=cfg.model.num_classes)
    path = cfg.data.data_path
    sub = "train" if train else "val"
    import os
    p = os.path.join(path, sub)
    if p.endswith(".zip") or os.path.isfile(p + ".zip"):
        return ZipImageFolder(p if p.endswith(".zip") else p + ".zip")
    return ImageFolder(p)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    multi_host = init_distributed()
    # per-host strided slice of every epoch (DistributedSampler role); the
    # global order/seeds don't depend on host count
    dshard = ((jax.process_index(), jax.process_count())
              if multi_host else None)
    mesh = create_mesh()
    print(f"devices: {jax.devices()} mesh: {mesh}")

    dtype = getattr(jnp, cfg.model.dtype)
    model = create_model(cfg.model.name, num_classes=cfg.model.num_classes,
                         dtype=dtype, **cfg.model.extra)
    train_ds = build_dataset(cfg, train=True)
    eval_ds = build_dataset(cfg, train=False)
    steps_per_epoch = max(len(train_ds) // cfg.data.batch_size, 1)
    total_steps = steps_per_epoch * cfg.train.epochs

    x0 = jnp.zeros((cfg.data.batch_size, cfg.data.img_size,
                    cfg.data.img_size, 3), dtype)
    variables = jax.jit(model.init)(jax.random.key(cfg.train.seed), x0)

    sched = cosine_schedule(cfg.train.base_lr,
                            cfg.train.warmup_epochs * steps_per_epoch,
                            total_steps, cfg.train.warmup_lr, cfg.train.min_lr)
    tx = make_adamw(sched, cfg.train.weight_decay,
                    clip_grad=cfg.train.clip_grad, params=variables["params"])
    if cfg.train.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.train.accumulation_steps)
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              ema_decay=cfg.train.ema_decay)

    ckpt_dir = f"{cfg.output}/{cfg.model.name}/{cfg.tag}/ckpt"
    start_epoch = 0
    if cfg.train.auto_resume and latest_step(ckpt_dir) is not None:
        state, extra, step = restore_checkpoint(ckpt_dir,
                                                jax.eval_shape(lambda: state))
        start_epoch = (extra or {}).get("epoch", 0) + 1
        print(f"auto-resumed from step {step} (epoch {start_epoch})")

    distill = cfg.distill.enabled and cfg.distill.teacher_logits_path
    if distill:
        from cream_tpu.distill.pipeline import make_distill_train_step
        train_step = make_distill_train_step(model, cfg.model.num_classes,
                                             mesh=mesh)
    else:
        train_step = make_train_step(model, loss_fn=soft_target_ce, mesh=mesh)
    eval_step = make_eval_step(model, mesh=mesh)

    rng = jax.random.key(cfg.train.seed)

    @jax.jit
    def mix_fn(seeds, images):
        from cream_tpu.data.mixup import seeded_pair_mixup
        return seeded_pair_mixup(
            seeds, images, jnp.zeros((images.shape[0],), jnp.int32),
            cfg.model.num_classes, cfg.aug.mixup, cfg.aug.cutmix,
            cfg.aug.mixup_switch_prob, cfg.aug.label_smoothing)

    max_acc = 0.0
    nan_count = 0
    scalar_log = None
    if cfg.train.tensorboard or cfg.train.wandb_project:
        from cream_tpu.train.metrics import ScalarLogger
        scalar_log = ScalarLogger(
            logdir=f"{cfg.output}/{cfg.model.name}/{cfg.tag}/tb",
            tensorboard=cfg.train.tensorboard,
            wandb_project=cfg.train.wandb_project or None,
            wandb_config=dataclasses.asdict(cfg) if cfg.train.wandb_project
            else None)
    ckpt = AsyncCheckpointer(ckpt_dir)  # saves overlap the next epoch's steps
    for epoch in range(start_epoch, cfg.train.epochs):
        logger = MetricLogger()
        t0 = time.time()
        reader = None
        if distill:
            from cream_tpu.distill import LogitsReader
            reader = LogitsReader(cfg.distill.teacher_logits_path, epoch)
        for i, batch in enumerate(prefetch(train_loader(
                train_ds, cfg.data.batch_size, epoch, cfg.train.seed,
                cfg.data.img_size, cfg.data.num_workers,
                transform=build_train_transform(cfg),
                repeated_aug=0 if distill else cfg.aug.repeated_aug,
                shard=dshard))):
            mix_rng = jax.random.fold_in(rng, epoch * steps_per_epoch + i)
            images = jnp.asarray(batch["image"], dtype)
            if distill:
                vals, idxs, seeds = reader.read_batch(batch["index"])
                assert (seeds == batch["seed"]).all(), \
                    "stored aug seeds diverge from the loader's"
                if cfg.aug.mixup > 0 or cfg.aug.cutmix > 0:
                    # replay the seeded pair mixup the save_logits pass
                    # applied to the teacher (TinyViT/main.py:310-311) —
                    # same seeds => identical pixels
                    images, _ = mix_fn(jnp.asarray(seeds), images)
                sb = shard_batch(mesh, {
                    "image": images,
                    "topk_values": jnp.asarray(vals),
                    "topk_indices": jnp.asarray(idxs)})
                state, metrics = train_step(state, sb, rng)
                logger.update(**{k: float(v) for k, v in metrics.items()})
                if i % 50 == 0:
                    print(f"epoch {epoch} [{i}/{steps_per_epoch}] {logger}")
                continue
            if cfg.aug.mixup > 0 or cfg.aug.cutmix > 0:
                images, targets = mixup_cutmix(
                    mix_rng, images, jnp.asarray(batch["label"]),
                    cfg.model.num_classes, cfg.aug.mixup, cfg.aug.cutmix,
                    cfg.aug.mixup_switch_prob, cfg.aug.label_smoothing)
            else:
                targets = jax.nn.one_hot(jnp.asarray(batch["label"]),
                                         cfg.model.num_classes)
            sb = shard_batch(mesh, {"image": images, "label": targets})
            state, metrics = train_step(state, sb, rng)
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                nan_count += 1
                print(f"WARNING: non-finite loss ({nan_count}/"
                      f"{cfg.train.nan_budget})")
                if nan_count > cfg.train.nan_budget:
                    raise FloatingPointError(
                        "NaN-loss budget exhausted — aborting (see "
                        "train.nan_budget)")
            logger.update(**{k: float(v) for k, v in metrics.items()})
            if scalar_log is not None and i % 20 == 0:
                scalar_log.log(int(state.step),
                               **{f"train/{k}": float(v)
                                  for k, v in metrics.items()})
            if i % 50 == 0:
                print(f"epoch {epoch} [{i}/{steps_per_epoch}] {logger} "
                      f"lr={float(sched(state.step)):.2e}")

        evals = [eval_step(state, shard_batch(mesh, {
            "image": jnp.asarray(b["image"], dtype),
            "label": jnp.asarray(b["label"])}))
            for b in eval_loader(eval_ds, cfg.data.batch_size,
                                 cfg.data.img_size, cfg.data.crop,
                                 num_workers=cfg.data.num_workers,
                                 native=cfg.data.native_loader,
                                 shard=dshard)]
        acc = topk_accuracy_counts([jax.device_get(e) for e in evals])
        max_acc = max(max_acc, acc["acc1"])
        print(f"epoch {epoch} done in {time.time()-t0:.1f}s "
              f"acc@1={acc['acc1']:.3f} acc@5={acc['acc5']:.3f} "
              f"(best {max_acc:.3f})")
        ckpt.save(int(state.step), state,
                  extra={"epoch": epoch, "max_accuracy": max_acc})
    ckpt.close()
    return max_acc


if __name__ == "__main__":
    main()
