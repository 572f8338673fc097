"""AutoFormer evolution search CLI (AutoFormer/evolution.py equivalent).

Candidate fitness = top-1 of the TRAINED masked supernet on the
(sub-sampled) val set; zero retraces across candidates (the masked supernet
compiles once). Weights come from --ckpt / --torch-ckpt, exactly like the
reference restores the trained supernet before searching
(evolution.py:537-544).

Full smoke recipe (supernet-train -> evolution -> subnet-eval):

    python -m cream_tpu.cli.supernet_train --space tiny \
        data.dataset=synthetic data.batch_size=32 train.epochs=2 \
        model.num_classes=16 output=/tmp/af
    python -m cream_tpu.cli.search_evolution --space tiny \
        --ckpt /tmp/af/autoformer_supernet_tiny/default/ckpt \
        data.dataset=synthetic model.num_classes=16 \
        --param-min 5e6 --param-max 12e6 --epochs 3 --population 8 \
        --out /tmp/af/evo.json
    # deploy: extract_subnet(variables, best_config) -> AutoFormerSubnet

On real data point data.data_path at ImageNet (the EVO_IMNET subset role is
played by --max-eval-batches over the val loader).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.core.config import Config
from cream_tpu.core.mesh import create_mesh, shard_batch
from cream_tpu.cli.train import build_dataset
from cream_tpu.data.imagenet import eval_loader
from cream_tpu.models import create_model
from cream_tpu.models.autoformer import (
    SPACES, config_param_count, encode_config, sample_config)
from cream_tpu.nas.evolution import (
    EvolutionSearcher, autoformer_crossover, autoformer_mutate)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--space", default="tiny", choices=list(SPACES))
    ap.add_argument("--param-min", type=float, default=0)
    ap.add_argument("--param-max", type=float, default=1e12)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--population", type=int, default=50)
    ap.add_argument("--max-eval-batches", type=int, default=20)
    ap.add_argument("--eval-chunk", type=int, default=8,
                    help="candidates scored per vmapped dispatch; 1 = serial")
    ap.add_argument("--evo-subset", type=int, default=0,
                    help="fixed per-class eval subset size (EVO_IMNET "
                    "semantics, AutoFormer/lib/subImageNet.py); 0 = off")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--out", default="evolution_result.json")
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir from supernet_train")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference supernet .pth (evolution.py:537-544)")
    ap.add_argument("--allow-random", action="store_true",
                    help="smoke tests only: search a random-init supernet")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    mesh = create_mesh()
    space = SPACES[args.space]
    dtype = getattr(jnp, cfg.model.dtype)
    model = create_model(f"autoformer_supernet_{args.space}",
                         num_classes=cfg.model.num_classes, dtype=dtype)

    import numpy as np
    x0 = jnp.zeros((cfg.data.batch_size, cfg.data.img_size,
                    cfg.data.img_size, 3), dtype)
    c0 = encode_config(sample_config(np.random.default_rng(0), space), space)
    # The supernet MUST carry trained weights — the reference loads the
    # trained checkpoint before searching (AutoFormer/evolution.py:537-544);
    # searching a random-init supernet yields noise.
    if args.torch_ckpt:
        from cream_tpu.zoo import load_model_variables
        variables = load_model_variables(f"autoformer_supernet_{args.space}",
                                         args.torch_ckpt)
    elif args.ckpt:
        from cream_tpu.core.checkpoint import restore_params
        shapes = jax.eval_shape(model.init, jax.random.key(0), x0, c0)
        variables = {"params": restore_params(args.ckpt, shapes["params"])}
    elif args.allow_random:
        variables = jax.jit(model.init)(jax.random.key(0), x0, c0)
    else:
        raise SystemExit(
            "refusing to search a RANDOM-init supernet: pass --ckpt (orbax "
            "dir from supernet_train) or --torch-ckpt (reference supernet "
            ".pth), or --allow-random for smoke tests only.")
    from cream_tpu.core.mesh import replicated_sharding
    variables = jax.device_put(variables, replicated_sharding(mesh))

    ds = build_dataset(cfg, train=False)
    if args.evo_subset > 0 and hasattr(ds, "samples"):
        from cream_tpu.data.imagenet import sub_imagenet
        ds = sub_imagenet(ds, per_class=args.evo_subset)
    batches = []
    for i, b in enumerate(eval_loader(ds, cfg.data.batch_size,
                                      cfg.data.img_size, cfg.data.crop)):
        if i >= args.max_eval_batches:
            break
        batches.append(shard_batch(mesh, {
            "image": jnp.asarray(b["image"], dtype),
            "label": jnp.asarray(b["label"])}))

    @jax.jit
    def acc_fn(variables, batch, enc):
        logits = model.apply(variables, batch["image"], enc)
        valid = batch["label"] >= 0
        correct = (logits.argmax(-1) == batch["label"]) & valid
        return correct.sum(), valid.sum()

    def eval_fn(config):
        enc = encode_config(config, space)
        c = n = 0
        for b in batches:
            ci, ni = acc_fn(variables, b, enc)
            c += int(ci)
            n += int(ni)
        return c / max(n, 1)

    # candidate-parallel fitness: the masked supernet takes the encoded
    # config as traced data, so vmapping over a stacked batch of configs
    # scores K candidates per dispatch with one compiled program (the
    # reference evaluates serially, AutoFormer/evolution.py:102-103).
    # Fixed chunk size K (pad by repeating the last config) avoids retraces.
    K = args.eval_chunk

    @jax.jit
    def batch_acc_fn(variables, batch, encs):
        def one(enc):
            logits = model.apply(variables, batch["image"], enc)
            valid = batch["label"] >= 0
            correct = (logits.argmax(-1) == batch["label"]) & valid
            return correct.sum(), valid.sum()
        return jax.vmap(one)(encs)

    def batch_eval_fn(configs):
        import jax.tree_util as jtu
        scores = []
        for i in range(0, len(configs), K):
            chunk = configs[i:i + K]
            pad = K - len(chunk)
            encs = [encode_config(c, space) for c in chunk]
            encs += [encs[-1]] * pad
            stacked = jtu.tree_map(lambda *xs: jnp.stack(xs), *encs)
            c = np.zeros(K)
            n = np.zeros(K)
            for b in batches:
                ci, ni = batch_acc_fn(variables, b, stacked)
                c += np.asarray(ci)
                n += np.asarray(ni)
            scores.extend((c / np.maximum(n, 1))[:len(chunk)].tolist())
        return scores

    searcher = EvolutionSearcher(
        sample_fn=lambda rng: sample_config(rng, space),
        eval_fn=eval_fn,
        batch_eval_fn=batch_eval_fn if K > 1 else None,
        mutate_fn=lambda rng, c: autoformer_mutate(rng, c, space),
        crossover_fn=autoformer_crossover,
        is_legal_extra=lambda c: args.param_min <= config_param_count(c)
        <= args.param_max,
        population_num=args.population, max_epochs=args.epochs)
    if args.resume and os.path.exists(args.resume):
        searcher.load_state_dict(json.load(open(args.resume)))
    top = searcher.search()
    with open(args.out, "w") as f:
        json.dump({"top": [(s, c) for s, c in top],
                   "state": searcher.state_dict()}, f, default=str)
    print("best:", top[0])
    return top


if __name__ == "__main__":
    main()
