"""Route a model name to its torch-checkpoint converter.

One entry point replaces the reference's per-project checkpoint loaders so
every zoo family is reachable from the eval/save_logits/search CLIs
(AutoFormerV2/evaluation.py, Cream/tools/test.py, TinyViT --eval, ...).
Structural hyperparameters (depths, heads, share_num, tower sizes) are read
from the same registries the model factories use, so converter and model
can't drift apart.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from cream_tpu.zoo import import_torch as it


def convert_for_model(name: str, sd: Mapping[str, np.ndarray],
                      with_head: bool = True) -> dict:
    """torch state_dict -> flax variables for the registered model `name`."""
    if name.startswith("tiny_vit"):
        return it.convert_tinyvit(sd, with_head=with_head)
    if name.startswith("efficientvit"):
        from cream_tpu.models.efficientvit import _CONFIGS
        cfg = _CONFIGS[name]
        return it.convert_efficientvit(sd, depths=cfg["depth"],
                                       num_heads=cfg["num_heads"],
                                       with_head=with_head)
    if name.startswith("mini_deit"):
        return it.convert_mini_deit(sd, with_head=with_head)
    if name.startswith("deit"):
        return it.convert_deit_rpe(sd, with_head=with_head)
    if name.startswith("mini_swin"):
        from cream_tpu.models.swin import _MINI_SWIN
        _, depths, _, _, share = _MINI_SWIN[name]
        return it.convert_mini_swin(sd, depths=depths, share_num=share,
                                    with_head=with_head)
    if name.startswith("swin"):
        from cream_tpu.models.swin import _SWIN
        _, depths, _, _ = _SWIN[name]
        return it.convert_swin(sd, depths=depths, with_head=with_head)
    if name.startswith("s3"):
        from cream_tpu.models.swin import _S3
        return it.convert_swin(sd, depths=_S3[name]["depths"],
                               with_head=with_head)
    if name.endswith("_classifier"):
        from cream_tpu.models.clip import _CLIP_CLASSIFIER_CONFIGS
        cfg = _CLIP_CLASSIFIER_CONFIGS[name]
        return it.convert_clip_classifier(sd, vision_layers=cfg.vision_layers)
    if name.startswith(("clip", "tinyclip")):
        from cream_tpu.models.clip import _CLIP_CONFIGS
        cfg = _CLIP_CONFIGS[name]
        return it.convert_clip(sd, vision_layers=cfg.vision_layers,
                               text_layers=cfg.text_layers)
    if name.startswith("autoformer_supernet"):
        return it.convert_autoformer_supernet(sd)
    if name.startswith("cream_"):
        from cream_tpu.models.cream import RELEASED_CHILDNETS
        return it.convert_cream_childnet(sd, RELEASED_CHILDNETS[name],
                                         with_head=with_head)
    if name.startswith("cydas_seg"):
        return it.convert_cydas_seg(sd)
    raise ValueError(f"no torch importer wired for model {name!r}")


def load_model_variables(name: str, ckpt_path: str,
                         with_head: bool = True,
                         template: dict | None = None) -> dict:
    """Load a torch .pth and convert it for model `name`.

    `template`: optional shape tree (e.g. ``jax.eval_shape`` of the target
    model's init). When given, position tables whose shapes mismatch are
    bicubic-interpolated exactly like the reference's ``load_pretrained``
    (TinyViT/utils.py:142-190) — the progressive-resolution finetune path
    (224 -> 384 -> 512 checkpoint inheritance).
    """
    sd = it.load_torch_state_dict(ckpt_path)
    variables = convert_for_model(name, sd, with_head=with_head)
    # some converters emit an empty batch_stats collection for BN-free
    # families (e.g. mini_swin) — drop it so remap/apply don't trip on a
    # collection the model never defines
    variables = {k: v for k, v in variables.items()
                 if not (isinstance(v, dict) and not v)}
    if template is not None:
        from cream_tpu.zoo.interpolate import remap_resolution
        variables = remap_resolution(variables, template)
    return variables


def load_pruned_clip(name: str, ckpt, quick_gelu: bool = False,
                     dtype=None) -> tuple:
    """TinyCLIP auto-WI PRUNED checkpoint -> (ragged CLIP model, variables).

    `name` picks the family config (full depths); `ckpt` is a .pth path or a
    {key: array} state_dict. The ragged geometry (per-layer kept heads/MLP
    widths, pruned hidden width, dropped layers) is read off the checkpoint
    shapes and materialized directly — the TPU-native replacement for the
    reference's zero-pad-into-full-model load_pruned_model
    (TinyCLIP/src/open_clip/model.py:1300-1409).
    """
    import dataclasses

    import jax.numpy as jnp

    from cream_tpu.models.clip import _CLIP_CONFIGS, CLIP

    cfg = _CLIP_CONFIGS[name]
    sd = ckpt if isinstance(ckpt, dict) else it.load_torch_state_dict(ckpt)
    ragged, variables = it.convert_clip_pruned(
        sd, vision_layers=cfg.vision_layers, text_layers=cfg.text_layers)
    cfg = dataclasses.replace(cfg, embed_dim=ragged["embed_dim"],
                              vision_width=ragged["vision_width"],
                              text_width=ragged["text_width"])
    model = CLIP(cfg=cfg, quick_gelu=quick_gelu,
                 vision_heads=ragged["vision_heads"],
                 vision_mlp_widths=ragged["vision_mlp_widths"],
                 text_heads_per_layer=ragged["text_heads_per_layer"],
                 text_mlp_widths=ragged["text_mlp_widths"],
                 dtype=dtype if dtype is not None else jnp.float32)
    return model, variables


def load_cdarts_retrain(ckpt, cells_json: str, model_type: str = "imagenet",
                        res_stem: bool = False, init_channels: int = 48,
                        num_classes: int = 1000) -> tuple:
    """CDARTS released retrain checkpoint + cells/*.json genotype file ->
    (CDARTSRetrain model, variables) — the CDARTS/CDARTS/test.py:72-86 path.
    `ckpt` is a .pth path or {key: array} dict; `cells_json` a path to the
    genotype JSON (or an already-parsed dict of genotype strings)."""
    import json

    from cream_tpu.models import create_model

    cells = cells_json if isinstance(cells_json, dict) else \
        json.loads(open(cells_json).read())
    name = ("cdarts_retrain_imagenet" if model_type == "imagenet"
            else "cdarts_retrain_cifar")
    model = create_model(name, genotypes=cells, num_classes=num_classes,
                         init_channels=init_channels,
                         **({"res_stem": res_stem}
                            if model_type == "imagenet" else {}))
    sd = ckpt if isinstance(ckpt, dict) else it.load_torch_state_dict(ckpt)
    variables = it.convert_cdarts_retrain(sd, model.genotypes,
                                          model_type=model_type,
                                          res_stem=res_stem)
    return model, variables


def shape_template(model, img_size: int, in_chans: int = 3) -> dict:
    """jax.eval_shape of model.init at `img_size` — the remap target."""
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((1, img_size, img_size, in_chans), jnp.float32)
    try:
        return jax.eval_shape(
            lambda k: model.init(k, x, train=False), jax.random.key(0))
    except TypeError:
        return jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
