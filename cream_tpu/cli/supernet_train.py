"""AutoFormer supernet training CLI (AutoFormer/supernet_train.py --mode super).

    python -m cream_tpu.cli.supernet_train --space tiny data.dataset=synthetic \
        data.batch_size=32 train.epochs=2

Every batch trains a uniformly-sampled subnet through the masked supernet
(single compile for the whole space).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.core.checkpoint import save_checkpoint
from cream_tpu.core.config import Config
from cream_tpu.cli.train import build_dataset
from cream_tpu.data.imagenet import train_loader
from cream_tpu.models import create_model
from cream_tpu.models.autoformer import SPACES, encode_config, sample_config
from cream_tpu.nas.supernet_engine import (
    make_supernet_train_step, train_supernet_epoch)
from cream_tpu.train import TrainState, cosine_schedule, make_adamw


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--space", default="tiny", choices=list(SPACES))
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
    state = TrainState.create(params=variables["params"], tx=tx)
    step = make_supernet_train_step(model)

    ckpt_dir = f"{cfg.output}/autoformer_supernet_{args.space}/{cfg.tag}/ckpt"
    for epoch in range(cfg.train.epochs):
        t0 = time.time()

        def batches():
            for b in train_loader(ds, cfg.data.batch_size, epoch,
                                  cfg.train.seed, cfg.data.img_size,
                                  cfg.data.num_workers):
                yield {"image": jnp.asarray(b["image"], dtype),
                       "label": jnp.asarray(b["label"])}

        state, losses = train_supernet_epoch(state, step, batches(), space,
                                             epoch, cfg.train.seed)
        print(f"epoch {epoch}: mean loss {np.mean(losses):.4f} "
              f"({time.time()-t0:.1f}s)")
        save_checkpoint(ckpt_dir, int(state.step), state,
                        extra={"epoch": epoch})


if __name__ == "__main__":
    main()
