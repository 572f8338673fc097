"""Bit-compatible PyTorch checkpoint importers.

Maps the reference projects' released state_dicts into this framework's flax
variable trees so public checkpoints evaluate identically (SURVEY.md §8.3).
Works from a plain {name: numpy array} dict — no torch required at import
time; `load_torch_state_dict` uses torch only if a .pth file is given.

Layout conversions:
  Conv2d (O, I, kh, kw)  -> HWIO (kh, kw, I, O)   [same rule covers depthwise]
  Linear (out, in)       -> (in, out)
  BN/LN weight -> scale; running_mean/var -> batch_stats mean/var
Dropped: num_batches_tracked, attention_bias_idxs buffers (recomputed
host-side — TinyViT/models/tiny_vit.py:619-625 drops them too).
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


class _TreeBuilder:
    def __init__(self):
        self.params: dict = {}
        self.batch_stats: dict = {}

    def _set(self, tree: dict, path: str, value: np.ndarray):
        keys = path.split("/")
        for k in keys[:-1]:
            tree = tree.setdefault(k, {})
        tree[keys[-1]] = value

    def conv_bn(self, sd: Mapping, tp: str, fp: str):
        """torch prefix tp = module with .c and .bn children -> flax ConvBN."""
        w = sd[f"{tp}.c.weight"]
        if w.ndim == 2:
            # EfficientViT released ckpts store some 1x1 convs as 2-D
            # (model/build.py:76-83 broadcasts d[k][:, :, None, None])
            w = w[:, :, None, None]
        self._set(self.params, f"{fp}/conv/kernel", _conv(w))
        self.bn(sd, f"{tp}.bn", f"{fp}/bn")

    def bn(self, sd: Mapping, tp: str, fp: str):
        self._set(self.params, f"{fp}/scale", sd[f"{tp}.weight"])
        self._set(self.params, f"{fp}/bias", sd[f"{tp}.bias"])
        self._set(self.batch_stats, f"{fp}/mean", sd[f"{tp}.running_mean"])
        self._set(self.batch_stats, f"{fp}/var", sd[f"{tp}.running_var"])

    def ln(self, sd: Mapping, tp: str, fp: str):
        self._set(self.params, f"{fp}/scale", sd[f"{tp}.weight"])
        self._set(self.params, f"{fp}/bias", sd[f"{tp}.bias"])

    def dense(self, sd: Mapping, tp: str, fp: str):
        self._set(self.params, f"{fp}/kernel", _dense(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            self._set(self.params, f"{fp}/bias", sd[f"{tp}.bias"])

    def dense_from(self, weight: np.ndarray, bias, fp: str):
        """Dense from explicit (out, in) weight / bias arrays (e.g. torch
        MultiheadAttention's in_proj_weight)."""
        self._set(self.params, f"{fp}/kernel", _dense(weight))
        if bias is not None:
            self._set(self.params, f"{fp}/bias", bias)

    def conv_biased(self, sd: Mapping, tp: str, fp: str):
        self._set(self.params, f"{fp}/kernel", _conv(sd[f"{tp}.weight"]))
        self._set(self.params, f"{fp}/bias", sd[f"{tp}.bias"])

    def raw(self, value: np.ndarray, fp: str):
        self._set(self.params, fp, value)

    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def convert_tinyvit(sd: Mapping[str, np.ndarray],
                    depths=(2, 2, 6, 2), with_head: bool = True) -> dict:
    """TinyViT torch state_dict -> flax variables (models/tinyvit.py naming)."""
    b = _TreeBuilder()
    b.conv_bn(sd, "patch_embed.seq.0", "patch_embed/conv1")
    b.conv_bn(sd, "patch_embed.seq.2", "patch_embed/conv2")

    for s in range(len(depths)):
        for i in range(depths[s]):
            tp = f"layers.{s}.blocks.{i}"
            fp = f"stages_{s}_{i}"
            if s == 0:  # MBConv
                for c in ("conv1", "conv2", "conv3"):
                    b.conv_bn(sd, f"{tp}.{c}", f"{fp}/{c}")
            else:       # TinyViTBlock
                b.ln(sd, f"{tp}.attn.norm", f"{fp}/attn/norm")
                b.dense(sd, f"{tp}.attn.qkv", f"{fp}/attn/qkv")
                b.dense(sd, f"{tp}.attn.proj", f"{fp}/attn/proj")
                b.raw(sd[f"{tp}.attn.attention_biases"],
                      f"{fp}/attn/attention_biases")
                b.conv_bn(sd, f"{tp}.local_conv", f"{fp}/local_conv")
                b.ln(sd, f"{tp}.mlp.norm", f"{fp}/mlp/norm")
                b.dense(sd, f"{tp}.mlp.fc1", f"{fp}/mlp/fc1")
                b.dense(sd, f"{tp}.mlp.fc2", f"{fp}/mlp/fc2")
        if s < len(depths) - 1:
            for c in ("conv1", "conv2", "conv3"):
                b.conv_bn(sd, f"layers.{s}.downsample.{c}", f"downsamples_{s}/{c}")

    b.ln(sd, "norm_head", "norm_head")
    if with_head and "head.weight" in sd:
        b.dense(sd, "head", "head")
    return b.variables()


def convert_deit_rpe(sd: Mapping[str, np.ndarray], depth: int = 12,
                     with_head: bool = True) -> dict:
    """DeiT(+iRPE) torch state_dict -> flax variables (models/deit_rpe.py).

    Covers plain DeiT and the ctx-product rpe_{k,q,v} lookup tables
    (iRPE/DeiT-with-iRPE/rpe_vision_transformer.py naming).
    """
    b = _TreeBuilder()
    b.raw(sd["cls_token"], "cls_token")
    b.raw(sd["pos_embed"], "pos_embed")
    if "dist_token" in sd:
        b.raw(sd["dist_token"], "dist_token")
    b.raw(_conv(sd["patch_embed.proj.weight"]), "patch_embed/kernel")
    b.raw(sd["patch_embed.proj.bias"], "patch_embed/bias")
    for i in range(depth):
        tp, fp = f"blocks.{i}", f"blocks_{i}"
        b.ln(sd, f"{tp}.norm1", f"{fp}/norm1")
        b.dense(sd, f"{tp}.attn.qkv", f"{fp}/attn/qkv")
        b.dense(sd, f"{tp}.attn.proj", f"{fp}/attn/proj")
        for r in ("rpe_q", "rpe_k", "rpe_v"):
            key = f"{tp}.attn.{r}.lookup_table_weight"
            if key in sd:
                b.raw(sd[key], f"{fp}/attn/{r}/lookup_table_weight")
            key = f"{tp}.attn.{r}.lookup_table_bias"
            if key in sd:
                b.raw(sd[key], f"{fp}/attn/{r}/lookup_table_bias")
            # cross method stores rp_rows/rp_cols children
            for sub in ("rp_rows", "rp_cols"):
                key = f"{tp}.attn.{r}.{sub}.lookup_table_weight"
                if key in sd:
                    b.raw(sd[key], f"{fp}/attn/{r}/{sub}/lookup_table_weight")
        b.ln(sd, f"{tp}.norm2", f"{fp}/norm2")
        b.dense(sd, f"{tp}.mlp.fc1", f"{fp}/mlp_fc1")
        b.dense(sd, f"{tp}.mlp.fc2", f"{fp}/mlp_fc2")
    b.ln(sd, "norm", "norm")
    if with_head and "head.weight" in sd:
        b.dense(sd, "head", "head")
        if "head_dist.weight" in sd:
            b.dense(sd, "head_dist", "head_dist")
    return b.variables()


def convert_mini_deit(sd: Mapping[str, np.ndarray], depth: int = 12,
                      repeated_times: int = 2, with_head: bool = True) -> dict:
    """Mini-DeiT torch state_dict -> flax variables (models/mini_deit.py).

    Layout: weight-multiplexed blocks `blocks.{i}.block.*` holding shared
    qkv/proj/mlp plus per-repeat RepeatedModuleList `instances.{r}` for
    norm1/norm2/rpe_k/conv_l/conv_w
    (MiniViT/Mini-DeiT/mini_vision_transformer.py:21-186; no cls token,
    mini_deit_models.py use_cls_token=False)."""
    b = _TreeBuilder()
    b.raw(sd["pos_embed"], "pos_embed")
    b.raw(_conv(sd["patch_embed.proj.weight"]), "patch_embed/kernel")
    b.raw(sd["patch_embed.proj.bias"], "patch_embed/bias")
    for i in range(depth // repeated_times):
        tp, fp = f"blocks.{i}.block", f"blocks_{i}"
        b.dense(sd, f"{tp}.attn.qkv", f"{fp}/qkv")
        b.dense(sd, f"{tp}.attn.proj", f"{fp}/proj")
        b.dense(sd, f"{tp}.mlp.fc1", f"{fp}/mlp_fc1")
        b.dense(sd, f"{tp}.mlp.fc2", f"{fp}/mlp_fc2")
        for r in range(repeated_times):
            b.ln(sd, f"{tp}.norm1.instances.{r}", f"{fp}/norm1_{r}")
            b.ln(sd, f"{tp}.norm2.instances.{r}", f"{fp}/norm2_{r}")
            key = f"{tp}.attn.rpe_k.instances.{r}.lookup_table_weight"
            if key in sd:
                b.raw(sd[key], f"{fp}/rpe_k_{r}/lookup_table_weight")
            for cname in ("conv_l", "conv_w"):
                key = f"{tp}.attn.{cname}.instances.{r}.weight"
                if key in sd:       # (h_out, h_in, 1, 1) -> Dense (h_in, h_out)
                    b.raw(sd[key][:, :, 0, 0].T, f"{fp}/{cname}_{r}/kernel")
    b.ln(sd, "norm", "norm")
    if with_head and "head.weight" in sd:
        b.dense(sd, "head", "head")
    return b.variables()


def convert_swin(sd: Mapping[str, np.ndarray], depths=(2, 2, 6, 2),
                 with_head: bool = True) -> dict:
    """Swin / S3 torch state_dict -> flax variables (models/swin.py naming).

    Covers the standard Swin layout and AutoFormerV2's SSS models (same
    structure, AutoFormerV2/model/SSS.py): layers.{s}.blocks.{i}.* with
    relative_position_bias_table, and layers.{s}.downsample.{reduction,norm}.
    relative_position_index buffers are dropped (recomputed host-side).
    """
    b = _TreeBuilder()
    b.raw(_conv(sd["patch_embed.proj.weight"]), "patch_embed/proj/kernel")
    b.raw(sd["patch_embed.proj.bias"], "patch_embed/proj/bias")
    b.ln(sd, "patch_embed.norm", "patch_embed/norm")
    for s in range(len(depths)):
        for i in range(depths[s]):
            tp, fp = f"layers.{s}.blocks.{i}", f"layers_{s}_block_{i}"
            b.ln(sd, f"{tp}.norm1", f"{fp}/norm1")
            b.dense(sd, f"{tp}.attn.qkv", f"{fp}/attn/qkv")
            b.dense(sd, f"{tp}.attn.proj", f"{fp}/attn/proj")
            b.raw(sd[f"{tp}.attn.relative_position_bias_table"],
                  f"{fp}/attn/relative_position_bias_table")
            b.ln(sd, f"{tp}.norm2", f"{fp}/norm2")
            b.dense(sd, f"{tp}.mlp.fc1", f"{fp}/mlp/fc1")
            b.dense(sd, f"{tp}.mlp.fc2", f"{fp}/mlp/fc2")
        dkey = f"layers.{s}.downsample"
        if f"{dkey}.reduction.weight" in sd:
            b.ln(sd, f"{dkey}.norm", f"layers_{s}_downsample/norm")
            b.dense(sd, f"{dkey}.reduction", f"layers_{s}_downsample/reduction")
    b.ln(sd, "norm", "norm")
    if with_head and "head.weight" in sd:
        b.dense(sd, "head", "head")
    return b.variables()


def convert_mini_swin(sd: Mapping[str, np.ndarray], depths=(2, 2, 6, 2),
                      share_num: int = 2, with_head: bool = True) -> dict:
    """Mini-Swin torch state_dict -> flax (models/swin.py MiniSwin naming).

    Shared attn/mlp per physical block + per-repeat norm lists, proj_l/proj_w
    transforms and local convs (swin_transformer_minivit.py:200-344)."""
    b = _TreeBuilder()
    b.raw(_conv(sd["patch_embed.proj.weight"]), "patch_embed/proj/kernel")
    b.raw(sd["patch_embed.proj.bias"], "patch_embed/proj/bias")
    b.ln(sd, "patch_embed.norm", "patch_embed/norm")
    for s in range(len(depths)):
        share = min(share_num, depths[s])
        n_blocks = depths[s] // share
        for i in range(n_blocks):
            tp, fp = f"layers.{s}.blocks.{i}", f"layers_{s}_block_{i}"
            b.dense(sd, f"{tp}.attn.qkv", f"{fp}/attn/qkv")
            b.dense(sd, f"{tp}.attn.proj", f"{fp}/attn/proj")
            b.raw(sd[f"{tp}.attn.relative_position_bias_table"],
                  f"{fp}/attn/relative_position_bias_table")
            b.dense(sd, f"{tp}.mlp.fc1", f"{fp}/mlp/fc1")
            b.dense(sd, f"{tp}.mlp.fc2", f"{fp}/mlp/fc2")
            for r in range(share):
                b.ln(sd, f"{tp}.norm1_list.{r}", f"{fp}/norm1_list_{r}")
                b.ln(sd, f"{tp}.norm2_list.{r}", f"{fp}/norm2_list_{r}")
                b.dense(sd, f"{tp}.proj_l.{r}", f"{fp}/proj_l_{r}")
                b.dense(sd, f"{tp}.proj_w.{r}", f"{fp}/proj_w_{r}")
                if f"{tp}.local_norm_list.{r}.weight" in sd:
                    b.ln(sd, f"{tp}.local_norm_list.{r}",
                         f"{fp}/local_norm_list_{r}")
                    b.raw(_conv(sd[f"{tp}.local_conv_list.{r}.weight"]),
                          f"{fp}/local_conv_list_{r}/kernel")
                    b.raw(sd[f"{tp}.local_conv_list.{r}.bias"],
                          f"{fp}/local_conv_list_{r}/bias")
        dkey = f"layers.{s}.downsample"
        if f"{dkey}.reduction.weight" in sd:
            b.ln(sd, f"{dkey}.norm", f"layers_{s}_downsample/norm")
            b.dense(sd, f"{dkey}.reduction", f"layers_{s}_downsample/reduction")
    b.ln(sd, "norm", "norm")
    if with_head and "head.weight" in sd:
        b.dense(sd, "head", "head")
    return b.variables()


def convert_clip(sd: Mapping[str, np.ndarray], vision_layers: int = 12,
                 text_layers: int = 12) -> dict:
    """open_clip/TinyCLIP CLIP state_dict -> flax (models/clip.py naming).

    Expects the modern layout: visual.*, transformer.resblocks.*,
    token_embedding, ln_final, text_projection, logit_scale. The three
    historical layouts are normalized first by `normalize_clip_layout`."""
    sd = normalize_clip_layout(sd)
    b = _TreeBuilder()

    def block(tp, fp):
        b.ln(sd, f"{tp}.ln_1", f"{fp}/ln_1")
        b.dense_from(sd[f"{tp}.attn.in_proj_weight"],
                     sd.get(f"{tp}.attn.in_proj_bias"), f"{fp}/attn/in_proj")
        b.dense(sd, f"{tp}.attn.out_proj", f"{fp}/attn/out_proj")
        b.ln(sd, f"{tp}.ln_2", f"{fp}/ln_2")
        b.dense(sd, f"{tp}.mlp.c_fc", f"{fp}/c_fc")
        b.dense(sd, f"{tp}.mlp.c_proj", f"{fp}/c_proj")

    b.raw(_conv(sd["visual.conv1.weight"]), "visual/conv1/kernel")
    b.raw(sd["visual.class_embedding"], "visual/class_embedding")
    b.raw(sd["visual.positional_embedding"], "visual/positional_embedding")
    b.ln(sd, "visual.ln_pre", "visual/ln_pre")
    for i in range(vision_layers):
        block(f"visual.transformer.resblocks.{i}",
              f"visual/transformer/resblocks_{i}")
    b.ln(sd, "visual.ln_post", "visual/ln_post")
    b.raw(sd["visual.proj"], "visual/proj")

    b.raw(sd["token_embedding.weight"], "text/token_embedding/embedding")
    b.raw(sd["positional_embedding"], "text/positional_embedding")
    for i in range(text_layers):
        block(f"transformer.resblocks.{i}", f"text/transformer/resblocks_{i}")
    b.ln(sd, "ln_final", "text/ln_final")
    b.raw(sd["text_projection"], "text/text_projection")
    b.raw(sd["logit_scale"].reshape(()), "logit_scale")
    return b.variables()


def convert_autoformer_supernet(sd: Mapping[str, np.ndarray],
                                with_head: bool = True) -> dict:
    """AutoFormer supernet torch state_dict -> flax (models/autoformer.py).

    One supernet checkpoint serves all subnets (SURVEY §8.3): the reference
    stores FULL super-shaped buffers and slices views at sample time
    (supernet_transformer.py:102-127), and the masked flax supernet holds the
    same full shapes, so the import is a direct name map. The interleaved
    qkv row order (q0,k0,v0,q1,...; qkv_super.py:72-77) is preserved as-is —
    ElasticAttention de-interleaves with its (..., U, 3) reshape."""
    depth = 0
    while f"blocks.{depth}.fc1.weight" in sd:
        depth += 1
    b = _TreeBuilder()
    b.raw(sd["cls_token"], "cls_token")
    if "pos_embed" in sd:
        b.raw(sd["pos_embed"], "pos_embed")
    b.raw(_conv(sd["patch_embed_super.proj.weight"]), "patch_embed/kernel")
    b.raw(sd["patch_embed_super.proj.bias"], "patch_embed/bias")
    for i in range(depth):
        tp, fp = f"blocks.{i}", f"blocks_{i}"
        b.ln(sd, f"{tp}.attn_layer_norm", f"{fp}/attn_layer_norm")
        b.dense(sd, f"{tp}.attn.qkv", f"{fp}/attn/qkv")
        b.dense(sd, f"{tp}.attn.proj", f"{fp}/attn/proj")
        for rel in ("rel_pos_embed_k", "rel_pos_embed_v"):
            for tab in ("embeddings_table_v", "embeddings_table_h"):
                key = f"{tp}.attn.{rel}.{tab}"
                if key in sd:
                    b.raw(sd[key], f"{fp}/attn/{rel}/{tab}")
        b.ln(sd, f"{tp}.ffn_layer_norm", f"{fp}/ffn_layer_norm")
        b.dense(sd, f"{tp}.fc1", f"{fp}/fc1")
        b.dense(sd, f"{tp}.fc2", f"{fp}/fc2")
    b.ln(sd, "norm", "norm")
    if with_head and "head.weight" in sd:
        b.dense(sd, "head", "head")
    return b.variables()


def convert_clip_classifier(sd: Mapping[str, np.ndarray],
                            vision_layers: int = 24) -> dict:
    """TinyViT's CLIP teacher checkpoint (vision tower + linear head,
    TinyViT/models/clip.py:108-158) -> flax (models/clip.py CLIPClassifier)."""
    sd = normalize_clip_layout(sd)
    b = _TreeBuilder()
    b.raw(_conv(sd["visual.conv1.weight"]), "visual/conv1/kernel")
    b.raw(sd["visual.class_embedding"], "visual/class_embedding")
    b.raw(sd["visual.positional_embedding"], "visual/positional_embedding")
    b.ln(sd, "visual.ln_pre", "visual/ln_pre")
    for i in range(vision_layers):
        tp, fp = (f"visual.transformer.resblocks.{i}",
                  f"visual/transformer/resblocks_{i}")
        b.ln(sd, f"{tp}.ln_1", f"{fp}/ln_1")
        b.dense_from(sd[f"{tp}.attn.in_proj_weight"],
                     sd.get(f"{tp}.attn.in_proj_bias"), f"{fp}/attn/in_proj")
        b.dense(sd, f"{tp}.attn.out_proj", f"{fp}/attn/out_proj")
        b.ln(sd, f"{tp}.ln_2", f"{fp}/ln_2")
        b.dense(sd, f"{tp}.mlp.c_fc", f"{fp}/c_fc")
        b.dense(sd, f"{tp}.mlp.c_proj", f"{fp}/c_proj")
    b.ln(sd, "visual.ln_post", "visual/ln_post")
    b.raw(sd["visual.proj"], "visual/proj")
    b.dense(sd, "head", "head")
    return b.variables()


def normalize_clip_layout(sd: Mapping[str, np.ndarray]) -> dict:
    """Normalize TinyCLIP's historical checkpoint layouts
    (model.py convert_to_new_checkpoint :1115-1160): strip DDP 'module.',
    map '_image_encoder.module.*' -> 'visual.*' and
    '_text_encoder.module.*' -> text-side top-level keys."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        # auto-weight-inheritance prefixes (model.py load_pruned_model:1322)
        k = k.replace("image_encoder_without_ddp", "_image_encoder") \
             .replace("text_encoder_without_ddp", "_text_encoder")
        if k == "_logit_scale.logit_scale":
            k = "logit_scale"
        if k.startswith("_image_encoder."):
            k = k.replace("_image_encoder.", "", 1)
            if k.startswith("module."):
                k = "visual." + k[len("module."):]
        elif k.startswith("_text_encoder."):
            k = k.replace("_text_encoder.", "", 1)
            if k.startswith("module."):
                k = k[len("module."):]
        out[k] = v
    return out


def convert_efficientvit(sd: Mapping[str, np.ndarray],
                         depths=(1, 2, 3), num_heads=(4, 4, 4),
                         with_head: bool = True) -> dict:
    """EfficientViT torch state_dict -> flax variables (models/efficientvit.py).

    The reference stores each stage as a flat Sequential blocks{1,2,3} where
    stages >0 start with [pre-sandwich, PatchMerging, post-sandwich]
    (EfficientViT/classification/model/efficientvit.py:314-332).
    """
    b = _TreeBuilder()
    for j, tseq in enumerate((0, 2, 4, 6)):
        b.conv_bn(sd, f"patch_embed.{tseq}", f"patch_embed_{j}")

    def evit_block(tp: str, fp: str, nh: int):
        b.conv_bn(sd, f"{tp}.dw0.m", f"{fp}/dw0")
        b.conv_bn(sd, f"{tp}.ffn0.m.pw1", f"{fp}/ffn0/pw1")
        b.conv_bn(sd, f"{tp}.ffn0.m.pw2", f"{fp}/ffn0/pw2")
        a_t, a_f = f"{tp}.mixer.m.attn", f"{fp}/mixer/attn"
        for i in range(nh):
            b.conv_bn(sd, f"{a_t}.qkvs.{i}", f"{a_f}/qkv_{i}")
            b.conv_bn(sd, f"{a_t}.dws.{i}", f"{a_f}/dw_{i}")
        b.conv_bn(sd, f"{a_t}.proj.1", f"{a_f}/proj")
        b.raw(sd[f"{a_t}.attention_biases"], f"{a_f}/attention_biases")
        b.conv_bn(sd, f"{tp}.dw1.m", f"{fp}/dw1")
        b.conv_bn(sd, f"{tp}.ffn1.m.pw1", f"{fp}/ffn1/pw1")
        b.conv_bn(sd, f"{tp}.ffn1.m.pw2", f"{fp}/ffn1/pw2")

    for s in range(len(depths)):
        seq = f"blocks{s + 1}"
        off = 0
        if s > 0:
            # pre-sandwich at the old width
            b.conv_bn(sd, f"{seq}.0.0.m", f"subsamples_{s-1}/pre_dw")
            b.conv_bn(sd, f"{seq}.0.1.m.pw1", f"subsamples_{s-1}/pre_ffn/pw1")
            b.conv_bn(sd, f"{seq}.0.1.m.pw2", f"subsamples_{s-1}/pre_ffn/pw2")
            # PatchMerging with SE
            mp = f"subsamples_{s-1}/merge"
            b.conv_bn(sd, f"{seq}.1.conv1", f"{mp}/conv1")
            b.conv_bn(sd, f"{seq}.1.conv2", f"{mp}/conv2")
            b.conv_biased(sd, f"{seq}.1.se.conv_reduce", f"{mp}/se/fc1")
            b.conv_biased(sd, f"{seq}.1.se.conv_expand", f"{mp}/se/fc2")
            b.conv_bn(sd, f"{seq}.1.conv3", f"{mp}/conv3")
            # post-sandwich at the new width
            b.conv_bn(sd, f"{seq}.2.0.m", f"subsamples_{s-1}/post_dw")
            b.conv_bn(sd, f"{seq}.2.1.m.pw1", f"subsamples_{s-1}/post_ffn/pw1")
            b.conv_bn(sd, f"{seq}.2.1.m.pw2", f"subsamples_{s-1}/post_ffn/pw2")
            off = 3
        for i in range(depths[s]):
            evit_block(f"{seq}.{off + i}", f"stages_{s}_{i}", num_heads[s])

    if with_head and "head.l.weight" in sd:
        b.bn(sd, "head.bn", "head/bn")
        b.dense(sd, "head.l", "head/linear")
        if "head_dist.l.weight" in sd:
            b.bn(sd, "head_dist.bn", "head_dist/bn")
            b.dense(sd, "head_dist.l", "head_dist/linear")
    return b.variables()


def convert_clip_resnet_tower(sd: Mapping[str, np.ndarray],
                              layers=(3, 4, 6, 3)) -> dict:
    """OpenAI-CLIP ModifiedResNet image tower state_dict -> flax variables
    (models/resnet.py:ModifiedResNet; reference
    TinyCLIP/src/open_clip/resnet.py:96-190). Accepts both bare tower dicts
    and full CLIP dicts with a 'visual.' prefix."""
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    b = _TreeBuilder()
    for i in (1, 2, 3):
        b.raw(_conv(sd[f"conv{i}.weight"]), f"conv{i}/kernel")
        b.bn(sd, f"bn{i}", f"bn{i}")
    for li, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            tp, fp = f"layer{li}.{bi}", f"layer{li}_{bi}"
            for c in (1, 2, 3):
                b.raw(_conv(sd[f"{tp}.conv{c}.weight"]), f"{fp}/conv{c}/kernel")
                b.bn(sd, f"{tp}.bn{c}", f"{fp}/bn{c}")
            if f"{tp}.downsample.0.weight" in sd:
                b.raw(_conv(sd[f"{tp}.downsample.0.weight"]),
                      f"{fp}/downsample_conv/kernel")
                b.bn(sd, f"{tp}.downsample.1", f"{fp}/downsample_bn")
    b.raw(sd["attnpool.positional_embedding"],
          "attnpool/positional_embedding")
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        b.dense(sd, f"attnpool.{p}", f"attnpool/{p}")
    return b.variables()


def convert_clip_rn(sd: Mapping[str, np.ndarray], layers=(3, 4, 6, 3),
                    text_layers: int = 12) -> dict:
    """Full RN-family CLIP state_dict (OpenAI RN50/RN101 layout) -> flax
    variables for models/resnet.py:CLIPResNet: ModifiedResNet visual tower +
    the standard text transformer."""
    tower = convert_clip_resnet_tower(sd, layers)
    b = _TreeBuilder()
    b.params["visual"] = tower["params"]
    b.batch_stats["visual"] = tower["batch_stats"]

    def block(tp, fp):
        b.ln(sd, f"{tp}.ln_1", f"{fp}/ln_1")
        b.dense_from(sd[f"{tp}.attn.in_proj_weight"],
                     sd.get(f"{tp}.attn.in_proj_bias"), f"{fp}/attn/in_proj")
        b.dense(sd, f"{tp}.attn.out_proj", f"{fp}/attn/out_proj")
        b.ln(sd, f"{tp}.ln_2", f"{fp}/ln_2")
        b.dense(sd, f"{tp}.mlp.c_fc", f"{fp}/c_fc")
        b.dense(sd, f"{tp}.mlp.c_proj", f"{fp}/c_proj")

    b.raw(sd["token_embedding.weight"], "text/token_embedding/embedding")
    b.raw(sd["positional_embedding"], "text/positional_embedding")
    for i in range(text_layers):
        block(f"transformer.resblocks.{i}", f"text/transformer/resblocks_{i}")
    b.ln(sd, "ln_final", "text/ln_final")
    b.raw(sd["text_projection"], "text/text_projection")
    b.raw(sd["logit_scale"].reshape(()), "logit_scale")
    return b.variables()


def convert_cream_childnet(sd: Mapping[str, np.ndarray], arch,
                           with_head: bool = True) -> dict:
    """Cream released-childnet torch state_dict -> flax variables
    (models/cream.py CreamChildNet naming).

    Reference layout: Cream/lib/models/structures/childnet.py — timm
    efficientnet keys (conv_stem/bn1, blocks.{stage}.{i}.{conv_pw,bn1,
    conv_dw,bn2,se.conv_reduce,se.conv_expand,conv_pwl,bn3}, blocks.0.0 ds
    block, blocks.{last}.0 ConvBnAct tail, conv_head w/ bias, classifier).
    `arch` is the per-stage nested genotype (models/cream.py
    RELEASED_CHILDNETS / nest_arch output) — only layer counts are used.
    """
    b = _TreeBuilder()

    def conv_bn_split(conv_tp: str, bn_tp: str, fp: str):
        b._set(b.params, f"{fp}/conv/kernel", _conv(sd[f"{conv_tp}.weight"]))
        b.bn(sd, bn_tp, f"{fp}/bn")

    def se(tp: str, fp: str):
        b.conv_biased(sd, f"{tp}.se.conv_reduce", f"{fp}/se/conv_reduce")
        b.conv_biased(sd, f"{tp}.se.conv_expand", f"{fp}/se/conv_expand")

    conv_bn_split("conv_stem", "bn1", "conv_stem")
    p = "blocks.0.0"
    conv_bn_split(f"{p}.conv_dw", f"{p}.bn1", "blocks_0/conv_dw")
    se(p, "blocks_0")
    conv_bn_split(f"{p}.conv_pw", f"{p}.bn2", "blocks_0/conv_pw")
    for s, ops in enumerate(arch):
        for i in range(len(ops)):
            p = f"blocks.{s + 1}.{i}"
            fp = f"stage_{s}_layer_{i}"
            conv_bn_split(f"{p}.conv_pw", f"{p}.bn1", f"{fp}/conv_pw")
            conv_bn_split(f"{p}.conv_dw", f"{p}.bn2", f"{fp}/conv_dw")
            se(p, fp)
            conv_bn_split(f"{p}.conv_pwl", f"{p}.bn3", f"{fp}/conv_pwl")
    tail = f"blocks.{len(arch) + 1}.0"
    conv_bn_split(f"{tail}.conv", f"{tail}.bn1", "blocks_tail")
    b.raw(_conv(sd["conv_head.weight"]), "conv_head/kernel")
    b.raw(sd["conv_head.bias"], "conv_head/bias")
    if with_head:
        b.dense(sd, "classifier", "classifier")
    return b.variables()


def convert_clip_pruned(sd: Mapping[str, np.ndarray], vision_layers: int,
                        text_layers: int, head_dim: int = 64
                        ) -> tuple[dict, dict]:
    """TinyCLIP auto-weight-inheritance PRUNED checkpoint -> ragged model.

    The reference loads pruned checkpoints by zero-padding every tensor back
    into the FULL model and masking the dead dims with l0 gates
    (TinyCLIP/src/open_clip/model.py:1300-1409 load_pruned_model). The
    TPU-native import materializes the ragged model directly instead: each
    resblock's kept head count is read off in_proj_weight
    (rows = 3*heads*head_dim, model.py MultiheadAttention.prune :239-263),
    the kept MLP width off c_fc, the kept hidden width off ln_pre /
    positional_embedding, and missing branches/layers (pruned away entirely,
    ResidualAttentionBlock.prune :317-341) become heads=0 / mlp_width=0
    block-skipping modules. Zero wasted compute, no gate tensors at eval.

    `vision_layers`/`text_layers` are the FULL depths (from the family
    config) so trailing fully-pruned layers keep their identity slots.
    Returns (ragged_kwargs, variables): ragged_kwargs has vision_width,
    vision_heads, vision_mlp_widths, text_width, text_heads_per_layer,
    text_mlp_widths, embed_dim for building the flax CLIP.
    """
    sd = normalize_clip_layout(sd)
    b = _TreeBuilder()

    def block(tp: str, fp: str) -> tuple[int, int]:
        heads = mlp = 0
        if f"{tp}.attn.in_proj_weight" in sd:
            heads = sd[f"{tp}.attn.in_proj_weight"].shape[0] // (3 * head_dim)
            b.ln(sd, f"{tp}.ln_1", f"{fp}/ln_1")
            b.dense_from(sd[f"{tp}.attn.in_proj_weight"],
                         sd.get(f"{tp}.attn.in_proj_bias"), f"{fp}/attn/in_proj")
            b.dense(sd, f"{tp}.attn.out_proj", f"{fp}/attn/out_proj")
        if f"{tp}.mlp.c_fc.weight" in sd:
            mlp = sd[f"{tp}.mlp.c_fc.weight"].shape[0]
            b.ln(sd, f"{tp}.ln_2", f"{fp}/ln_2")
            b.dense(sd, f"{tp}.mlp.c_fc", f"{fp}/c_fc")
            b.dense(sd, f"{tp}.mlp.c_proj", f"{fp}/c_proj")
        return heads, mlp

    v_heads, v_mlps = [], []
    b.raw(_conv(sd["visual.conv1.weight"]), "visual/conv1/kernel")
    b.raw(sd["visual.class_embedding"], "visual/class_embedding")
    b.raw(sd["visual.positional_embedding"], "visual/positional_embedding")
    b.ln(sd, "visual.ln_pre", "visual/ln_pre")
    for i in range(vision_layers):
        h, m = block(f"visual.transformer.resblocks.{i}",
                     f"visual/transformer/resblocks_{i}")
        v_heads.append(h)
        v_mlps.append(m)
    b.ln(sd, "visual.ln_post", "visual/ln_post")
    b.raw(sd["visual.proj"], "visual/proj")

    t_heads, t_mlps = [], []
    b.raw(sd["token_embedding.weight"], "text/token_embedding/embedding")
    b.raw(sd["positional_embedding"], "text/positional_embedding")
    for i in range(text_layers):
        h, m = block(f"transformer.resblocks.{i}",
                     f"text/transformer/resblocks_{i}")
        t_heads.append(h)
        t_mlps.append(m)
    b.ln(sd, "ln_final", "text/ln_final")
    b.raw(sd["text_projection"], "text/text_projection")
    b.raw(np.asarray(sd["logit_scale"]).reshape(()), "logit_scale")

    ragged = dict(
        vision_width=int(sd["visual.ln_pre.weight"].shape[0]),
        vision_heads=tuple(v_heads), vision_mlp_widths=tuple(v_mlps),
        text_width=int(sd["positional_embedding"].shape[1]),
        text_heads_per_layer=tuple(t_heads), text_mlp_widths=tuple(t_mlps),
        embed_dim=int(sd["visual.proj"].shape[1]),
    )
    return ragged, b.variables()


def convert_cdarts_retrain(sd: Mapping[str, np.ndarray], genotypes,
                           model_type: str = "imagenet",
                           res_stem: bool = False,
                           with_head: bool = True) -> dict:
    """CDARTS released retrain checkpoint -> flax variables
    (models/darts.py CDARTSRetrain naming).

    Reference layout: lib/models/model_test.py ModelTest — Sequential stems
    under feature_extractor.{j}.{idx}, cells under nas_layers.{L}.{i} with
    ops.py child names (StdConv net.{1,2}, FactorizedReduce conv1/conv2/bn,
    SepConv net.{0,1}.net.{1,2,3}, DilConv net.{1,2,3}), classifier fc.
    `genotypes`: per-layer Genotype list (models/darts.py genotype_from_str
    of the cell_file entries).
    """
    from cream_tpu.models.darts import cdarts_retrain_plan

    b = _TreeBuilder()

    def conv_bn_seq(tp: str, ci: int, bi: int, fp: str):
        b._set(b.params, f"{fp}/conv/kernel", _conv(sd[f"{tp}.{ci}.weight"]))
        b.bn(sd, f"{tp}.{bi}", f"{fp}/bn")

    def std_conv(tp: str, fp: str):
        conv_bn_seq(f"{tp}.net", 1, 2, f"{fp}/conv_bn")

    def fac_reduce(tp: str, fp: str):
        b.raw(_conv(sd[f"{tp}.conv1.weight"]), f"{fp}/conv1/kernel")
        b.raw(_conv(sd[f"{tp}.conv2.weight"]), f"{fp}/conv2/kernel")
        b.bn(sd, f"{tp}.bn", f"{fp}/bn")

    def op_params(op_name: str, stride: int, tp: str, fp: str):
        # non-Identity ops are wrapped in Sequential(op, DropPath_)
        # (genotypes.py to_dag:24-28) -> extra '.0' in their keys
        tp = f"{tp}.0"
        if op_name.startswith("sep_conv"):
            for j in range(2):
                b.raw(_conv(sd[f"{tp}.net.{j}.net.1.weight"]), f"{fp}/dw{j}/kernel")
                b.raw(_conv(sd[f"{tp}.net.{j}.net.2.weight"]), f"{fp}/pw{j}/kernel")
                b.bn(sd, f"{tp}.net.{j}.net.3", f"{fp}/bn{j}")
        elif op_name.startswith("dil_conv"):
            b.raw(_conv(sd[f"{tp}.net.1.weight"]), f"{fp}/dw/kernel")
            b.raw(_conv(sd[f"{tp}.net.2.weight"]), f"{fp}/pw/kernel")
            b.bn(sd, f"{tp}.net.3", f"{fp}/bn")
        elif op_name == "skip_connect" and stride != 1:
            fac_reduce(tp, fp)
        elif op_name == "conv_7x1_1x7":
            b.raw(_conv(sd[f"{tp}.net.1.weight"]), f"{fp}/conv_a/kernel")
            b.raw(_conv(sd[f"{tp}.net.2.weight"]), f"{fp}/conv_b/kernel")
            b.bn(sd, f"{tp}.net.3", f"{fp}/bn")
        # pools / identity / none: no params

    # stems
    if model_type == "cifar":
        conv_bn_seq("feature_extractor.0", 0, 1, "stem")
    elif res_stem:
        conv_bn_seq("feature_extractor.0", 0, 1, "stem")
    else:
        conv_bn_seq("feature_extractor.0", 0, 1, "stem0_a")
        conv_bn_seq("feature_extractor.0", 3, 4, "stem0_b")
        conv_bn_seq("feature_extractor.1", 1, 2, "stem1")

    reductions, cell_nums, reduction_p = cdarts_retrain_plan(model_type,
                                                             res_stem)
    for li, genotype in enumerate(genotypes):
        reduction_cur, cell_num = reductions[li], cell_nums[li]
        reduction_idx = 0 if res_stem else cell_num - 1
        for i in range(cell_num):
            reduction = (i == reduction_idx) and reduction_cur
            tp = f"nas_layers.{li}.{i}"
            fp = f"cell_{li}_{i}"
            if reduction_p:
                fac_reduce(f"{tp}.preproc0", f"{fp}/preproc0")
            else:
                std_conv(f"{tp}.preproc0", f"{fp}/preproc0")
            std_conv(f"{tp}.preproc1", f"{fp}/preproc1")
            gene = genotype.reduce if reduction else genotype.normal
            for n, edges in enumerate(gene):
                for e, (op_name, s_idx) in enumerate(edges):
                    stride = 2 if reduction and s_idx < 2 else 1
                    op_params(op_name, stride, f"{tp}.dag.{n}.{e}",
                              f"{fp}/dag_{n}_{e}")
            reduction_p = reduction
        if res_stem:
            reduction_p = False

    if with_head:
        b.dense(sd, "fc", "fc")
    return b.variables()


def convert_cydas_seg(sd: Mapping[str, np.ndarray]) -> dict:
    """CyDASseg (CDARTS segmentation downstream) torch state_dict -> flax
    variables (models/cydas_seg.py naming).

    Reference layout (CDARTS/CDARTS_segmentation/train/cydas.py:336-383):
    `backbone.*` is a timm-style ChildNet (conv_stem/bn1, blocks.0.0 ds,
    blocks.{1..5}.{i} ir, blocks.6.0 cn tail; conv_head/classifier exist in
    the ckpt but are never used by the seg forward and are skipped);
    `arms32/refines32` are ConvNorm Sequentials (.conv.0 conv, .conv.1 bn);
    `ffm.conv_1x1` / `*.conv_3x3` are ConvBnRelu (.conv/.bn); Self_Attn
    heads hold their pipeline in a Sequential `net` (0 conv,1 bn,3 ATT,
    5 bn,7 conv,8 bn) plus an optional conv shortcut (att_sa.py:146-183).
    """
    from cream_tpu.models.cydas_seg import CYDAS_STAGES

    b = _TreeBuilder()

    def conv_bn_split(conv_tp: str, bn_tp: str, fp: str):
        b._set(b.params, f"{fp}/conv/kernel", _conv(sd[f"{conv_tp}.weight"]))
        b.bn(sd, bn_tp, f"{fp}/bn")

    def se(tp: str, fp: str):
        b.conv_biased(sd, f"{tp}.se.conv_reduce", f"{fp}/se/conv_reduce")
        b.conv_biased(sd, f"{tp}.se.conv_expand", f"{fp}/se/conv_expand")

    def conv_norm(tp: str, fp: str):
        """operations.py ConvNorm(slimmable=False): .conv.0 conv, .conv.1 bn."""
        conv_bn_split(f"{tp}.conv.0", f"{tp}.conv.1", f"{fp}/conv")

    def conv_bn_relu(tp: str, fp: str):
        """seg_oprs.py ConvBnRelu: .conv / .bn children."""
        conv_bn_split(f"{tp}.conv", f"{tp}.bn", fp)

    def self_attn(tp: str, fp: str, has_shortcut: bool):
        if has_shortcut:
            conv_bn_split(f"{tp}.shortcut.0", f"{tp}.shortcut.1",
                          f"{fp}/shortcut")
        conv_bn_split(f"{tp}.net.0", f"{tp}.net.1", f"{fp}/net_proj")
        for c in ("query_conv", "key_conv", "value_conv"):
            b.conv_biased(sd, f"{tp}.net.3.{c}", f"{fp}/att/{c}")
        b.raw(sd[f"{tp}.net.3.gamma"], f"{fp}/att/gamma")
        b.bn(sd, f"{tp}.net.5", f"{fp}/net_bn")
        conv_bn_split(f"{tp}.net.7", f"{tp}.net.8", f"{fp}/net_out")

    # --- backbone ---
    p = "backbone"
    conv_bn_split(f"{p}.conv_stem", f"{p}.bn1", "backbone/conv_stem")
    q = f"{p}.blocks.0.0"
    conv_bn_split(f"{q}.conv_dw", f"{q}.bn1", "backbone/blocks_0/conv_dw")
    se(q, "backbone/blocks_0")
    conv_bn_split(f"{q}.conv_pw", f"{q}.bn2", "backbone/blocks_0/conv_pw")
    for s, (_, _, blocks) in enumerate(CYDAS_STAGES):
        for i in range(len(blocks)):
            q = f"{p}.blocks.{s + 1}.{i}"
            fp = f"backbone/stage_{s}_layer_{i}"
            conv_bn_split(f"{q}.conv_pw", f"{q}.bn1", f"{fp}/conv_pw")
            conv_bn_split(f"{q}.conv_dw", f"{q}.bn2", f"{fp}/conv_dw")
            se(q, fp)
            conv_bn_split(f"{q}.conv_pwl", f"{q}.bn3", f"{fp}/conv_pwl")
    tail = f"{p}.blocks.{len(CYDAS_STAGES) + 1}.0"
    conv_bn_split(f"{tail}.conv", f"{tail}.bn1", "backbone/blocks_tail")

    # --- aggregation path ---
    conv_norm("arms32.0", "arms32_0")
    conv_norm("arms32.1", "arms32_1")
    conv_norm("refines32.0", "refines32_0")
    conv_norm("refines32.1", "refines32_1")
    conv_bn_relu("ffm.conv_1x1", "ffm/conv")

    # --- heads ---
    conv_norm("heads8.feature_projection", "heads8/feature_projection")
    self_attn("heads8.att_sa", "heads8/att_sa", has_shortcut=False)
    conv_bn_relu("heads8.conv_3x3", "heads8/conv_3x3")
    b.conv_biased(sd, "heads8.conv_1x1", "heads8/conv_1x1")
    if "heads16.conv_1x1.weight" in sd:
        self_attn("heads16.att_sa", "heads16/att_sa", has_shortcut=False)
        b.conv_biased(sd, "heads16.conv_1x1", "heads16/conv_1x1")
        self_attn("heads32.att_sa", "heads32/att_sa", has_shortcut=True)
        b.conv_biased(sd, "heads32.conv_1x1", "heads32/conv_1x1")
    return b.variables()
