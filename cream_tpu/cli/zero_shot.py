"""CLIP zero-shot ImageNet evaluation CLI (TinyCLIP/src/training/zero_shot.py).

    python -m cream_tpu.cli.zero_shot model.name=tinyclip_vit_39m_16_text_19m \
        data.data_path=/data/imagenet --bpe /path/bpe_simple_vocab_16e6.txt.gz \
        [--torch-ckpt TinyCLIP-ViT-39M-16-Text-19M.pth] [--classnames file.txt]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from cream_tpu.core.config import Config
from cream_tpu.cli.train import build_dataset
from cream_tpu.data.imagenet import eval_loader
from cream_tpu.data.tokenizer import get_tokenizer
from cream_tpu.models import create_model
from cream_tpu.train.zero_shot import build_zero_shot_classifier, zero_shot_eval


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--bpe", default=None)
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("--classnames", default=None,
                    help="file with one class name per line (dataset order)")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    dtype = getattr(jnp, cfg.model.dtype)
    model = create_model(cfg.model.name, dtype=dtype, **cfg.model.extra)
    if args.torch_ckpt:
        from cream_tpu.zoo import convert_clip, load_torch_state_dict
        variables = convert_clip(load_torch_state_dict(args.torch_ckpt),
                                 vision_layers=model.cfg.vision_layers,
                                 text_layers=model.cfg.text_layers)
    else:
        img0 = jnp.zeros((1, model.cfg.image_size, model.cfg.image_size, 3), dtype)
        txt0 = jnp.zeros((1, model.cfg.context_length), jnp.int32)
        variables = jax.jit(model.init)(jax.random.key(0), img0, txt0)

    ds = build_dataset(cfg, train=False)
    templates = None
    if args.classnames:
        classnames = [l.strip() for l in open(args.classnames) if l.strip()]
    elif (getattr(ds, "num_classes", 1000) or 1000) == 1000:
        # full OpenAI ImageNet set (80 templates x 1000 names) — the
        # reference's published zero-shot numbers use exactly these
        from cream_tpu.train.zero_shot import openai_imagenet_constants
        classnames, templates = openai_imagenet_constants()
    else:
        classnames = [f"class {i}" for i in
                      range(getattr(ds, "num_classes", 1000) or 1000)]

    tokenizer = get_tokenizer(args.bpe)
    encode_text = jax.jit(lambda t: model.apply(
        variables, t, method="encode_text"))
    encode_image = jax.jit(lambda x: model.apply(
        variables, x, method="encode_image"))

    kw = {"templates": templates} if templates else {}
    from cream_tpu.core.mesh import create_mesh
    classifier = build_zero_shot_classifier(encode_text, tokenizer,
                                            classnames, mesh=create_mesh(),
                                            **kw)
    batches = (
        {"image": jnp.asarray(b["image"], dtype), "label": b["label"]}
        for b in eval_loader(ds, cfg.data.batch_size, model.cfg.image_size,
                             crop=True, clip_norm=True))
    res = zero_shot_eval(encode_image, classifier, batches)
    print(f"zero-shot top1={res['zeroshot_top1']:.3f} "
          f"top5={res['zeroshot_top5']:.3f} n={res['n']}")
    return res


if __name__ == "__main__":
    main()
