"""Golden-activation parity harness for released checkpoints.

The environment this framework is developed in has no network access, so
"top-1 within 0.1% on released weights" cannot be certified here. This CLI
is the documented offline protocol (PARITY.md): on any machine with the
released .pth files,

  1. `--dump golden.npz` runs the imported model on a deterministic input
     battery (256 seeded synthetic images — identical bytes on every
     machine) and stores logits;
  2. `python tools/golden_torch_side.py --model ... --ckpt ... --out
     theirs.npz` runs the reference repo's PyTorch model on the SAME
     battery and stores the torch-side logits (one command per side);
  3. `--compare ours.npz theirs.npz` reports max|diff|, top-1 agreement and
     top-5 overlap.

The in-repo test suite runs the same comparison against random-init
reference oracles (tests/test_parity_*.py) — this harness extends it to
real weights wherever they are available.

    python -m cream_tpu.cli.golden --model tiny_vit_21m_224 \
        --torch-ckpt tiny_vit_21m_22kto1k_distill.pth --dump ours.npz
    python -m cream_tpu.cli.golden --compare ours.npz theirs.npz
"""
from __future__ import annotations

import argparse

import numpy as np


def battery(n: int = 256, img: int = 224, seed: int = 0) -> np.ndarray:
    """Deterministic input battery: seeded uniform images in [0, 1),
    ImageNet-normalized — identical bytes on every machine."""
    rng = np.random.Generator(np.random.PCG64(seed))
    x = rng.random((n, img, img, 3), np.float32)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std


def dump_ours(model_name: str, ckpt: str, out: str, img: int, n: int,
              cells_json: str | None = None,
              subnet_yaml: str | None = None):
    """Family routing (same special cases as the reference eval entry
    points): CLIP dumps L2-normalized image features; cdarts_retrain_*
    needs --cells-json (the shipped genotype file the checkpoint was
    retrained from, CDARTS/test.py:72-86); autoformer_supernet_* needs
    --subnet-yaml (experiments/subnet/AutoFormer-*.yaml, whose RETRAIN
    section picks the released subnet)."""
    import jax
    import jax.numpy as jnp

    from cream_tpu.models import create_model

    x = battery(n, img)
    if model_name.startswith(("tinyclip", "clip")) \
            and not model_name.endswith(("_classifier", "_tower")):
        from cream_tpu.zoo import load_model_variables
        model = create_model(model_name)
        variables = load_model_variables(model_name, ckpt)
        fwd = jax.jit(lambda v, x: model.apply(
            v, x, normalized=True, method=model.encode_image))
    elif model_name.startswith("cdarts_retrain"):
        if not cells_json:
            raise SystemExit("cdarts_retrain_* needs --cells-json")
        from cream_tpu.zoo.load import load_cdarts_retrain
        model_type = ("imagenet" if model_name.endswith("imagenet")
                      else "cifar")
        init_c = 48 if model_type == "imagenet" else 36
        model, variables = load_cdarts_retrain(
            ckpt, cells_json, model_type=model_type, init_channels=init_c)
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    elif model_name.startswith("autoformer_supernet"):
        if not subnet_yaml:
            raise SystemExit("autoformer_supernet_* needs --subnet-yaml")
        from cream_tpu.models.autoformer import encode_config
        from cream_tpu.zoo import load_model_variables
        model = create_model(model_name)
        cfg = encode_config(_parse_retrain_yaml(subnet_yaml), model.space)
        variables = load_model_variables(model_name, ckpt)
        fwd = jax.jit(lambda v, x: model.apply(v, x, cfg, train=False))
    else:
        from cream_tpu.zoo import load_model_variables, shape_template
        model = create_model(model_name)
        tmpl = None
        try:
            tmpl = shape_template(model, img)
        except TypeError:
            pass
        variables = load_model_variables(model_name, ckpt, template=tmpl)
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    logits = fwd(variables, jnp.asarray(x))
    np.savez(out, logits=np.asarray(logits, np.float32),
             model=model_name, img=img, n=n)
    print(f"wrote {out}: logits {logits.shape}")


def _parse_retrain_yaml(path: str) -> dict:
    """experiments/subnet/AutoFormer-*.yaml RETRAIN -> reference-style
    config dict (evolution.py decode format), depth-padding handled by
    encode_config. Minimal parser — the yaml is flat lists of scalars."""
    import yaml
    r = yaml.safe_load(open(path))["RETRAIN"]
    depth = int(r["DEPTH"])
    return {"layer_num": depth,
            "embed_dim": [int(r["EMBED_DIM"])] * depth
            if not isinstance(r["EMBED_DIM"], list)
            else [int(e) for e in r["EMBED_DIM"]][:depth],
            "num_heads": [int(h) for h in r["NUM_HEADS"]][:depth],
            "mlp_ratio": [float(m) for m in r["MLP_RATIO"]][:depth]}


def compare(a_path: str, b_path: str, top1_tol: float = 0.0):
    a = np.load(a_path, allow_pickle=True)
    b = np.load(b_path, allow_pickle=True)
    la, lb = a["logits"], b["logits"]
    assert la.shape == lb.shape, (la.shape, lb.shape)
    maxdiff = float(np.abs(la - lb).max())
    t1a, t1b = la.argmax(-1), lb.argmax(-1)
    agree = float((t1a == t1b).mean())
    t5a = np.argsort(-la, -1)[:, :5]
    overlap = float(np.mean([len(set(r) & set(s)) / 5
                             for r, s in zip(t5a, np.argsort(-lb, -1)[:, :5])]))
    print(f"max|logit diff| = {maxdiff:.3e}  top1 agreement = {agree:.3f}  "
          f"top5 overlap = {overlap:.3f}")
    if agree < 1.0 - top1_tol:
        raise SystemExit(f"top-1 agreement {agree} below tolerance")
    return {"maxdiff": maxdiff, "top1_agree": agree, "top5_overlap": overlap}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--dump", default=None, help="output .npz path")
    ap.add_argument("--cells-json", default=None,
                    help="cdarts_retrain_*: genotype cells .json")
    ap.add_argument("--subnet-yaml", default=None,
                    help="autoformer_supernet_*: released subnet yaml")
    ap.add_argument("--compare", nargs=2, default=None,
                    metavar=("OURS", "THEIRS"))
    args = ap.parse_args(argv)
    if args.compare:
        return compare(*args.compare)
    if not (args.model and args.torch_ckpt and args.dump):
        raise SystemExit("need --model + --torch-ckpt + --dump (or --compare)")
    dump_ours(args.model, args.torch_ckpt, args.dump, args.img, args.n,
              cells_json=args.cells_json, subnet_yaml=args.subnet_yaml)


if __name__ == "__main__":
    main()
