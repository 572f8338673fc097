"""CDARTS multi-stage search CLI (CDARTS/CDARTS/search.py equivalent).

Runs the full staged campaign — supernet warmup, cyclic joint optimization
(alphas + discretized-net weights with the interactive loss), layer-by-layer
discretization with super->nas parameter copy — and writes a genotype
history JSON.

Smoke recipe (CIFAR-shaped synthetic data, ~5 min on CPU — the staged loop
recompiles per discretization, so compile time dominates at toy scale):

    python -m cream_tpu.cli.search_cdarts --synthetic --cpu --layers 2 \
        --cells 1 --channels 8 --nodes 2 --steps 2 --iters 1 \
        --batch-size 8 --aux-pool 4 --out /tmp/cdarts_genotypes.json

On CIFAR-10 point --data-dir at a directory of (images.npy, labels.npy)
train/val pairs; the search uses the reference's split-in-half protocol
(search.py get_search_datasets).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.nas.cdarts_stage import MultiStageSearcher, StageSearchConfig


def synthetic_batches(batch: int, num_classes: int, image: int = 32,
                      n: int = 8, seed: int = 0):
    rng = np.random.default_rng(seed)
    data = [{"image": jnp.asarray(rng.standard_normal(
                 (batch, image, image, 3)), jnp.float32),
             "label": jnp.asarray(rng.integers(0, num_classes, batch))}
            for _ in range(n)]
    def gen():
        yield from data
    return gen


def npy_batches(path: str, split: str, batch: int):
    images = np.load(os.path.join(path, f"{split}_images.npy"), mmap_mode="r")
    labels = np.load(os.path.join(path, f"{split}_labels.npy"))
    def gen():
        for i in range(0, len(labels) - batch + 1, batch):
            x = np.asarray(images[i:i + batch], np.float32)
            if x.max() > 2.0:
                x = x / 255.0
            yield {"image": jnp.asarray(x),
                   "label": jnp.asarray(labels[i:i + batch])}
    return gen


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-classes", type=int, default=10)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--cells", type=int, default=2,
                    help="cells per layer (reference cell_num)")
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=4)
    ap.add_argument("--pretrain-epochs", type=int, default=1)
    ap.add_argument("--iters", type=int, default=2,
                    help="search iters per layer stage")
    ap.add_argument("--steps", type=int, default=8,
                    help="train/val steps per iter")
    ap.add_argument("--aux-pool", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="cdarts_genotypes.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the staged loop recompiles per "
                         "discretization; tiny smoke runs compile faster "
                         "on host)")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = StageSearchConfig(
        layer_num=args.layers, cells_per_layer=args.cells, n_nodes=args.nodes,
        C=args.channels, num_classes=args.num_classes,
        pretrain_epochs=args.pretrain_epochs, search_iters=args.iters,
        steps_per_iter=args.steps, aux_pool_size=args.aux_pool)

    if args.synthetic or not args.data_dir:
        train_b = synthetic_batches(args.batch_size, args.num_classes,
                                    n=args.steps, seed=args.seed)
        val_b = synthetic_batches(args.batch_size, args.num_classes,
                                  n=args.steps, seed=args.seed + 1)
    else:
        train_b = npy_batches(args.data_dir, "train", args.batch_size)
        val_b = npy_batches(args.data_dir, "val", args.batch_size)

    sample = next(iter(val_b()))
    searcher = MultiStageSearcher(cfg, jax.random.key(args.seed), sample)
    genotypes, history = searcher.run(train_b, val_b)

    result = {
        "final_genotypes": [g._asdict() for g in genotypes],
        "history": [{**h, "genotype": h["genotype"]._asdict()}
                    for h in history],
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2, default=str)
    print(f"wrote {args.out}: {len(history)} search iters, "
          f"{len(genotypes)} layer genotypes")


if __name__ == "__main__":
    main()
