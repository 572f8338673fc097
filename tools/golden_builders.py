"""Torch-side golden builders — one per zoo family — for
tools/golden_torch_side.py --builder.

Each zero-arg function returns the reference repo's own torch model,
constructed exactly like that project's eval entry point builds its
released flagship checkpoint, so a released .pth loads strict. Usage
(documented per-family in PARITY.md):

    python tools/golden_torch_side.py --model s3_tiny \
        --builder tools/golden_builders.py:s3_tiny \
        --ckpt S3-T.pth --out theirs.npz

All reference code is loaded live from /root/reference via the same
tests/torch_ref.py loaders the parity test suite uses (timm/easydict
stubbed where the reference expects old pinned versions). Model
hyperparameters are the released-checkpoint ones from each project's
config (cited inline).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("GOLDEN_REF_ROOT", "/root/reference")


def _torch_ref():
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch_ref
    return torch_ref


def s3_tiny():
    """AutoFormerV2 S3-T (configs/S3-T.yaml; evaluation.py builds
    SSSTransformer from exactly these lists)."""
    tr = _torch_ref()
    sss = tr.load_ref_module("AutoFormerV2/model/SSS.py", "ref_sss")
    return sss.SSSTransformer(
        img_size=224, patch_size=4, in_chans=3, num_classes=1000,
        embed_dim=[96, 192, 384, 768], depths=[2, 2, 6, 2],
        num_heads=[[3, 3], [6, 6], [12] * 8, [24, 24]],
        window_size=[[7, 7], [7, 7], [14] * 8, [7, 7]],
        mlp_ratio=[[4.0, 4.0], [4.0, 4.0], [4.0] * 8, [4.0, 4.0]],
        qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0)


def mini_swin_tiny():
    """Mini-Swin-Tiny (configs/swin_tiny_patch4_window7_224_minivit_
    sharenum6.yaml: embed 96, depths [2,2,6,2], heads [3,6,12,24],
    separate_layernum [1,1,1,1])."""
    tr = _torch_ref()
    mod = tr.load_ref_module(
        "MiniViT/Mini-Swin/models/swin_transformer_minivit.py",
        "ref_minivit")
    return mod.SwinTransformerMiniViT(
        img_size=224, patch_size=4, in_chans=3, num_classes=1000,
        embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
        window_size=7, mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0,
        drop_path_rate=0.0, is_sep_layernorm=True, is_transform_FFN=True,
        is_transform_heads=True, separate_layer_num_list=[1, 1, 1, 1])


def mini_deit_tiny():
    """Mini-DeiT-Tiny (mini_deit_models.py:mini_deit_tiny_patch16_224 —
    deit-tiny geometry + shared-k iRPE skip=0, repeated_times=2,
    use_transform, no cls token)."""
    import torch
    tr = _torch_ref()
    tr.install_easydict_stub()
    irpe = tr.load_ref_module("MiniViT/Mini-DeiT/irpe.py", "irpe")
    mod = tr.load_ref_module("MiniViT/Mini-DeiT/mini_vision_transformer.py",
                             "ref_mini_deit_vit")
    rpe = irpe.get_rpe_config(ratio=1.9, method="product", mode="ctx",
                              shared_head=True, skip=0, rpe_on="k")
    return mod.VisionTransformer(
        img_size=224, patch_size=16, embed_dim=192, depth=12, num_heads=3,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        rpe_config=rpe, use_cls_token=False, repeated_times=2,
        use_transform=True)


def deit_small_rpe_k():
    """DeiT-S + iRPE rpe-50 shared-k (models.py:deit_small_patch16_224 with
    get_rpe_config(ratio=1.9, product, ctx, shared_head, skip=1,
    rpe_on='k'))."""
    import torch
    tr = _torch_ref()
    tr.install_easydict_stub()
    irpe = tr.load_ref_module("iRPE/DeiT-with-iRPE/irpe.py", "irpe")
    mod = tr.load_ref_module("iRPE/DeiT-with-iRPE/rpe_vision_transformer.py",
                             "ref_rpe_vit")
    rpe = irpe.get_rpe_config(ratio=1.9, method="product", mode="ctx",
                              shared_head=True, skip=1, rpe_on="k")
    return mod.VisionTransformer(
        img_size=224, patch_size=16, embed_dim=384, depth=12, num_heads=6,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        rpe_config=rpe)


def autoformer_tiny():
    """AutoFormer-T: tiny supernet with the released subnet sampled
    (experiments/subnet/AutoFormer-T.yaml RETRAIN; supernet_transformer.py
    set_sample_config, padded to super depth like evolution.py does)."""
    import collections.abc
    import types
    if "torch._six" not in sys.modules:  # removed in modern torch
        six = types.ModuleType("torch._six")
        six.container_abcs = collections.abc
        sys.modules["torch._six"] = six
    sys.path.insert(0, os.path.join(REFERENCE, "AutoFormer"))
    try:
        import model.supernet_transformer as st
    finally:
        sys.path.remove(os.path.join(REFERENCE, "AutoFormer"))
    # SUPERNET section of experiments/subnet/AutoFormer-T.yaml: embed 256
    # (= 4 heads x 64, NOT the 240 search-space max — the rel-pos tables are
    # sized super_embed//heads and must be 64 wide), depth 14, heads 4
    model = st.Vision_TransformerSuper(
        img_size=224, patch_size=16, num_classes=1000,
        embed_dim=256, depth=14, num_heads=4, mlp_ratio=4.0,
        qkv_bias=True, gp=True, relative_position=True, change_qkv=True,
        abs_pos=True, max_relative_position=14)
    # AutoFormer-T.yaml RETRAIN section, depth-padded to 14
    mlp = [3.5, 3.5, 3.0, 3.5, 3.0, 3.0, 4.0, 4.0, 3.5, 4.0, 3.5, 4.0, 3.5]
    heads = [3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 4, 3, 3]
    cfg = {
        "layer_num": 13,
        "embed_dim": [192] * 14,
        "num_heads": heads + [4],
        "mlp_ratio": mlp + [4.0],
    }
    model.set_sample_config(cfg)

    # qkv_super.set_sample_config COPIES strided weight slices (change_qkv
    # fancy indexing), so sampling must be re-applied AFTER weights load or
    # the attention runs on stale init values. Hook load_state_dict.
    orig_load = model.load_state_dict

    def load_then_resample(sd, strict=False):
        r = orig_load(sd, strict=strict)
        model.set_sample_config(cfg)
        return r

    model.load_state_dict = load_then_resample
    return model


def cream_14():
    """Cream-14 childnet (Cream/tools/test.py:79-97 geometry, via the same
    live childnet stack the parity test uses)."""
    return _cream(((3,), (3, 3), (3, 3), (3,), (3,)))


def cream_604():
    return _cream(((3, 3, 2, 3, 3), (3, 2, 3, 2, 3), (3, 2, 3, 2, 3),
                   (3, 3, 3, 3), (3, 3, 3, 3)))


def _cream(arch):
    tr = _torch_ref()
    mod = tr.load_cream_childnet_module()
    stem = ['ds_r1_k3_s1_e1_c16_se0.25', 'cn_r1_k1_s1_c320_se0.25']
    pool = ['ir_r1_k3_s2_e4_c24_se0.25', 'ir_r1_k5_s2_e4_c40_se0.25',
            'ir_r1_k3_s2_e6_c80_se0.25', 'ir_r1_k3_s1_e6_c96_se0.25',
            'ir_r1_k5_s2_e6_c192_se0.25']
    arch_list = [[0]] + [list(s) for s in arch] + [[0]]
    arch_def = [[stem[0]]] + \
        [[pool[i] for _ in range(len(arch_list[i + 1]))]
         for i in range(len(pool))] + [[stem[1]]]
    return mod.gen_childnet(arch_list, arch_def, num_classes=1000,
                            drop_rate=0.0, global_pool='avg')


def cdarts_imagenet():
    """CDARTS ImageNet retrain model (CDARTS/test.py:72-86 from the shipped
    cells/imagenet_genotype.json, init_channel 48). ModelTest.forward
    returns (logits, aux_logits); the wrapper keeps logits only."""
    import torch
    tr = _torch_ref()
    mod = tr.load_cdarts_model_test()
    import lib.utils.genotypes as gt
    cells = os.path.join(REFERENCE, "CDARTS/CDARTS/cells",
                         "imagenet_genotype.json")
    r_dict = json.loads(open(cells).read())
    genotypes = {int(k): gt.from_str(v) for k, v in r_dict.items()}
    inner = mod.ModelTest(genotypes, "imagenet", res_stem=False,
                          init_channel=48, stem_multiplier=3, n_nodes=4,
                          num_classes=1000)

    class Logits0(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x):
            return self.inner(x)[0]

        def load_state_dict(self, sd, strict=False):
            return self.inner.load_state_dict(sd, strict=strict)

        def state_dict(self):
            return self.inner.state_dict()

    return Logits0(inner)


def tinyclip_vit_39m_16_text_19m():
    """TinyCLIP-ViT-39M-16-Text-19M image tower (open_clip/model.py CLIP from
    model_configs/TinyCLIP-ViT-39M-16-Text-19M.json). forward(x) returns
    L2-NORMALIZED image features — compare against our
    `--features` golden dump."""
    import torch
    tr = _torch_ref()
    oc = tr.load_tinyclip_module()
    cfg = json.loads(open(os.path.join(
        REFERENCE, "TinyCLIP/src/open_clip/model_configs",
        "TinyCLIP-ViT-39M-16-Text-19M.json")).read())
    clip = oc.CLIP(embed_dim=cfg["embed_dim"], vision_cfg=cfg["vision_cfg"],
                   text_cfg=cfg["text_cfg"])

    class ImageTower(torch.nn.Module):
        def __init__(self, clip):
            super().__init__()
            self.clip = clip

        def forward(self, x):
            f = self.clip.encode_image(x)
            return f / f.norm(dim=-1, keepdim=True)

        def load_state_dict(self, sd, strict=False):
            # TinyCLIP's CLIPBase.load_state_dict returns None
            r = self.clip.load_state_dict(sd, strict=strict)
            return r if r is not None else ([], [])

        def state_dict(self):
            return self.clip.state_dict()

    return ImageTower(clip)
