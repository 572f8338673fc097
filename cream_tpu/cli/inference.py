"""Single-image top-5 inference (TinyViT/inference.py:1-34 parity).

    python -m cream_tpu.cli.inference --image cat.jpg model.name=tiny_vit_21m_224
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from cream_tpu.core.config import Config
from cream_tpu.data.transforms import eval_preprocess_config, preprocess_pil
from cream_tpu.models import create_model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args(argv)
    cfg = Config.from_yaml(args.cfg, args.opts)

    dtype = getattr(jnp, cfg.model.dtype)
    model = create_model(cfg.model.name, num_classes=cfg.model.num_classes,
                         dtype=dtype, **cfg.model.extra)
    from cream_tpu.cli.eval import load_variables
    variables = load_variables(cfg, model, args.torch_ckpt)

    pp = eval_preprocess_config(cfg.data.img_size, crop=cfg.data.crop)
    img = preprocess_pil(Image.open(args.image), pp)
    logits = jax.jit(lambda v, x: model.apply(v, x))(
        variables, jnp.asarray(img, dtype)[None])
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)[0]
    top5 = np.asarray(jax.lax.top_k(probs, 5)[1])
    for rank, c in enumerate(top5):
        print(f"top{rank + 1}: class {int(c)}  p={float(probs[c]):.4f}")
    return top5


if __name__ == "__main__":
    main()
