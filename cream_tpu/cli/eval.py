"""Evaluation CLI: top-1/top-5 of a model (optionally from a torch checkpoint).

Replaces the per-project eval entries (AutoFormerV2/evaluation.py,
Cream/tools/test.py, EfficientViT eval mode, TinyViT --eval):

    python -m cream_tpu.cli.eval model.name=tiny_vit_21m_224 \
        data.data_path=/data/imagenet [--torch-ckpt tiny_vit_21m_22kto1k.pth]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from cream_tpu.core.config import Config
from cream_tpu.core.mesh import create_mesh, init_distributed, shard_batch
from cream_tpu.cli.train import build_dataset
from cream_tpu.data.imagenet import eval_loader
from cream_tpu.models import create_model
from cream_tpu.train import TrainState, make_eval_step, topk_accuracy_counts
import optax


def load_variables(cfg: Config, model, torch_ckpt: str | None):
    if torch_ckpt:
        from cream_tpu.zoo import load_model_variables, shape_template
        # shape template enables progressive-resolution inheritance: a
        # 224-shaped checkpoint loads into the 384/512 models with the
        # position tables bicubic-remapped (TinyViT/utils.py:142-190)
        try:
            tmpl = shape_template(model, cfg.data.img_size)
        except TypeError:   # two-tower models init with (image, text)
            tmpl = None
        return load_model_variables(cfg.model.name, torch_ckpt, template=tmpl)
    x0 = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
    return jax.jit(model.init)(jax.random.key(0), x0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    multi_host = init_distributed()
    dshard = ((jax.process_index(), jax.process_count())
              if multi_host else None)
    mesh = create_mesh()
    dtype = getattr(jnp, cfg.model.dtype)
    model = create_model(cfg.model.name, num_classes=cfg.model.num_classes,
                         dtype=dtype, **cfg.model.extra)
    variables = load_variables(cfg, model, args.torch_ckpt)
    state = TrainState.create(params=variables["params"],
                              tx=optax.identity(),
                              batch_stats=variables.get("batch_stats", {}))
    eval_step = make_eval_step(model, mesh=mesh)
    ds = build_dataset(cfg, train=False)
    results = []
    for b in eval_loader(ds, cfg.data.batch_size, cfg.data.img_size,
                         cfg.data.crop, num_workers=cfg.data.num_workers,
                         native=cfg.data.native_loader, shard=dshard):
        sb = shard_batch(mesh, {"image": jnp.asarray(b["image"], dtype),
                                "label": jnp.asarray(b["label"])})
        results.append(jax.device_get(eval_step(state, sb)))
    acc = topk_accuracy_counts(results)
    print(f"acc@1={acc['acc1']:.3f} acc@5={acc['acc5']:.3f} n={acc['n']}")
    return acc


if __name__ == "__main__":
    main()
