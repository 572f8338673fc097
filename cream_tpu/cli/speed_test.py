"""Throughput harness across the model zoo.

Replaces EfficientViT/classification/speed_test.py:19-100 and the throughput
modes in TinyViT/main.py:458 and MiniViT: warmup then timed images/s, bf16,
jitted, execution forced via a chained lax.scan (see bench.py for why).

    python -m cream_tpu.cli.speed_test --models efficientvit_m0 tiny_vit_21m_224 \
        --batch 256 --img-size 224

`--device cpu` mirrors the reference's single-thread CPU latency mode
(EfficientViT/classification/speed_test.py:19,56-65: torch.set_num_threads(1),
batch 1, fp32): XLA CPU backend pinned to one intra-op thread.
"""
from __future__ import annotations

import argparse
import json
import os


def _force_cpu(threads: int) -> None:
    """Must run before the jax backend initializes. JAX_PLATFORMS is
    overridden by sitecustomize in this environment, so use jax.config."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_multi_thread_eigen="
                               + ("true" if threads > 1 else "false")
                               + f" intra_op_parallelism_threads={threads}")
    import jax
    jax.config.update("jax_platforms", "cpu")


def throughput(model, batch: int, img_size: int, dtype=None,
               n_iters: int = 20, **init_kw) -> float:
    import bench  # repo-root harness; single source of timing truth
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((batch, img_size, img_size, 3), dtype or jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), x, **init_kw)
    return bench.timed_throughput(lambda v, xx: model.apply(v, xx),
                                  variables, x, n_iters)[0]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["efficientvit_m5",
                                                    "tiny_vit_21m_224"])
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 256 (tpu) / 1 (cpu, reference protocol)")
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--dtype", default=None,
                    help="default: bfloat16 (tpu) / float32 (cpu)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--device", choices=["tpu", "cpu"], default="tpu",
                    help="cpu = single-thread XLA CPU, the reference's "
                         "speed_test CPU protocol")
    ap.add_argument("--cpu-threads", type=int, default=1)
    args = ap.parse_args(argv)
    if args.device == "cpu":
        _force_cpu(args.cpu_threads)
    batch = args.batch or (1 if args.device == "cpu" else 256)
    dtype_name = args.dtype or ("float32" if args.device == "cpu"
                                else "bfloat16")

    import jax.numpy as jnp

    from cream_tpu.models import create_model, list_models
    dtype = getattr(jnp, dtype_name)
    results = {}
    for name in args.models:
        if name not in list_models():
            print(f"skip unknown model {name}")
            continue
        model = create_model(name, dtype=dtype)
        ips = throughput(model, batch, args.img_size, dtype, args.iters)
        results[name] = round(ips, 1)
        print(json.dumps({"model": name, "img_per_s": results[name],
                          "batch": batch, "dtype": dtype_name,
                          "device": args.device}))
    return results


if __name__ == "__main__":
    main()
