"""Throughput harness across the model zoo.

Replaces EfficientViT/classification/speed_test.py:19-100 and the throughput
modes in TinyViT/main.py:458 and MiniViT: warmup then timed images/s, bf16,
jitted, execution forced via a chained lax.scan (see bench.py for why).

    python -m cream_tpu.cli.speed_test --models efficientvit_m0 tiny_vit_21m_224 \
        --batch 256 --img-size 224
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model, list_models


def throughput(model, batch: int, img_size: int, dtype=jnp.bfloat16,
               n_iters: int = 20, **init_kw) -> float:
    import bench  # repo-root harness; single source of timing truth
    x = jnp.zeros((batch, img_size, img_size, 3), dtype)
    variables = jax.jit(model.init)(jax.random.key(0), x, **init_kw)
    return bench.timed_throughput(lambda v, xx: model.apply(v, xx),
                                  variables, x, n_iters)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["efficientvit_m5",
                                                    "tiny_vit_21m_224"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    results = {}
    for name in args.models:
        if name not in list_models():
            print(f"skip unknown model {name}")
            continue
        model = create_model(name, dtype=getattr(jnp, args.dtype))
        ips = throughput(model, args.batch, args.img_size,
                         getattr(jnp, args.dtype), args.iters)
        results[name] = round(ips, 1)
        print(json.dumps({"model": name, "img_per_s": results[name],
                          "batch": args.batch, "dtype": args.dtype}))
    return results


if __name__ == "__main__":
    main()
