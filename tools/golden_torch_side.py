"""Reference-side golden runner — run this ON a machine that has the
reference repo + released .pth checkpoints + torch. One command per side:

  # reference side (this script; needs torch, the reference checkout):
  python tools/golden_torch_side.py --model tiny_vit_21m_224 \
      --ckpt tiny_vit_21m_22kto1k_distill.pth --out theirs.npz

  # our side (cream_tpu):
  python -m cream_tpu.cli.golden --model tiny_vit_21m_224 \
      --torch-ckpt tiny_vit_21m_22kto1k_distill.pth --dump ours.npz
  python -m cream_tpu.cli.golden --compare ours.npz theirs.npz

The input battery is bit-identical on both sides (seeded PCG64, see
cream_tpu/cli/golden.py:battery). Models are built from the reference
sources themselves (default root /root/reference):
  tiny_vit_*      -> TinyViT/models/tiny_vit.py factories
  efficientvit_m* -> EfficientViT/classification/model/build.py
  s3_*/swin       -> via --builder module:function override
If timm is missing, the repo's test stub (tests/torch_ref.py) is installed
so the reference files import — stub modules match released state_dicts.
"""
import argparse
import importlib.util
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def battery(n: int = 256, img: int = 224, seed: int = 0) -> np.ndarray:
    """The shared deterministic battery. When the cream_tpu repo is
    importable (it is pure numpy at this entry point) the ONE definition in
    cream_tpu/cli/golden.py is used, so the two sides cannot drift; the
    inline fallback below exists only for running this file standalone next
    to a torch checkout, and must match that function bit-for-bit."""
    try:
        sys.path.insert(0, REPO)
        from cream_tpu.cli.golden import battery as _b
        return _b(n, img, seed)
    except ImportError:
        pass
    rng = np.random.Generator(np.random.PCG64(seed))
    x = rng.random((n, img, img, 3), np.float32)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std


def _ensure_timm():
    try:
        import timm  # noqa: F401
        return
    except ImportError:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        try:
            import torch_ref
        except ImportError as e:  # running outside the repo without timm
            raise SystemExit(
                "timm not installed and tests/torch_ref.py not found; "
                "install timm==0.3.2 (TinyViT) / timm (EfficientViT)") from e
        torch_ref.install_timm_stub()
        torch_ref.install_easydict_stub()


def _load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_model(model: str, ref_root: str, builder: str | None):
    import torch  # noqa: F401
    if builder:  # "path/to/file.py:fn_name"
        path, fn = builder.split(":")
        mod = _load_module(path, "golden_builder_mod")
        return getattr(mod, fn)()
    if model.startswith("tiny_vit"):
        _ensure_timm()
        sys.path.insert(0, os.path.join(ref_root, "TinyViT"))
        mod = _load_module(
            os.path.join(ref_root, "TinyViT", "models", "tiny_vit.py"),
            "ref_tiny_vit")
        return getattr(mod, model)(pretrained=False)
    if model.startswith("efficientvit"):
        cls_root = os.path.join(ref_root, "EfficientViT", "classification")
        sys.path.insert(0, cls_root)
        from model.build import EfficientViT_M0, EfficientViT_M1  # noqa
        import model.build as build_mod
        fn = getattr(build_mod, "EfficientViT_" + model.split("_")[-1].upper())
        return fn(pretrained=None)
    raise SystemExit(f"no builder for {model}; pass --builder file.py:fn")


def load_ckpt(model, ckpt_path: str):
    import torch
    sd = torch.load(ckpt_path, map_location="cpu")
    for key in ("model", "state_dict", "model_ema"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # attention_bias_idxs etc. are buffers recomputed at init — report only
    real_missing = [k for k in missing if "attention_bias_idxs" not in k]
    if real_missing or unexpected:
        print(f"WARN missing={real_missing[:8]} unexpected={unexpected[:8]}")
    return model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref-root", default="/root/reference")
    ap.add_argument("--builder", default=None,
                    help="override: path/to/file.py:builder_fn")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args(argv)

    import torch
    model = build_model(args.model, args.ref_root, args.builder)
    model = load_ckpt(model, args.ckpt).eval()
    x = battery(args.n, args.img)                       # NHWC
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    outs = []
    with torch.no_grad():
        for i in range(0, args.n, args.batch):
            outs.append(model(xt[i:i + args.batch]).float().numpy())
    logits = np.concatenate(outs, 0)
    np.savez(args.out, logits=logits, model=args.model, img=args.img,
             n=args.n)
    print(f"wrote {args.out}: logits {logits.shape}")


if __name__ == "__main__":
    main()
