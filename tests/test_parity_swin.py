"""Full-model parity vs reference Swin-lineage models through the importers:
S3/SSS (AutoFormerV2) and Mini-Swin (MiniViT)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model
from cream_tpu.models.swin import MiniSwin, SwinTransformer
from cream_tpu.zoo import convert_mini_swin, convert_swin

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def sss_ref():
    from torch_ref import load_ref_module
    return load_ref_module("AutoFormerV2/model/SSS.py", "ref_sss")


@pytest.fixture(scope="module")
def mini_swin_ref():
    from torch_ref import load_ref_module
    return load_ref_module(
        "MiniViT/Mini-Swin/models/swin_transformer_minivit.py", "ref_minivit")


def test_s3_parity(sss_ref):
    torch.manual_seed(0)
    tmodel = sss_ref.SSSTransformer(
        img_size=224, patch_size=4, in_chans=3, num_classes=10,
        embed_dim=[32, 64, 128, 256], depths=[1, 1, 2, 1],
        num_heads=[[1], [2], [4, 4], [8]],
        window_size=[[7], [7], [14, 14], [7]],
        mlp_ratio=[[4.0], [4.0], [4.0, 4.0], [4.0]],
        qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0)
    tmodel.eval()

    x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_swin(sd, depths=(1, 1, 2, 1))
    jmodel = SwinTransformer(
        num_classes=10, embed_dims=(32, 64, 128, 256), depths=(1, 1, 2, 1),
        num_heads=((1,), (2,), (4, 4), (8,)),
        window_sizes=((7,), (7,), (14, 14), (7,)), head_dim=32,
        drop_path_rate=0.0)
    out = jax.jit(lambda v, x: jmodel.apply(v, x))(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_mini_swin_parity(mini_swin_ref):
    torch.manual_seed(0)
    tmodel = mini_swin_ref.SwinTransformerMiniViT(
        img_size=224, patch_size=4, in_chans=3, num_classes=10,
        embed_dim=32, depths=[2, 2], num_heads=[2, 4], window_size=7,
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        is_sep_layernorm=True, is_transform_FFN=True, is_transform_heads=True,
        separate_layer_num_list=[1, 1])
    tmodel.eval()

    x = np.random.RandomState(1).randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_mini_swin(sd, depths=(2, 2), share_num=2)
    jmodel = MiniSwin(num_classes=10, embed_dims=(32, 64), depths=(2, 2),
                      num_heads=(2, 4), window_size=7, share_num=2,
                      drop_path_rate=0.0)
    out = jax.jit(lambda v, x: jmodel.apply(v, x))(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_clip_importer_structural():
    """convert_clip: build a torch-layout state dict with random values, load
    into our CLIP, check shapes load and the model runs (the transformer
    semantics themselves are standard pre-LN CLIP)."""
    from cream_tpu.models.clip import CLIP, CLIPConfig
    cfg = CLIPConfig(embed_dim=32, vision_width=64, vision_layers=2,
                     vision_patch=16, image_size=64, text_width=64,
                     text_layers=2, text_heads=1, context_length=12,
                     vocab_size=100)
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {"visual.conv1.weight": t(64, 3, 16, 16),
          "visual.class_embedding": t(64),
          "visual.positional_embedding": t(17, 64),
          "visual.ln_pre.weight": t(64) + 1, "visual.ln_pre.bias": t(64),
          "visual.ln_post.weight": t(64) + 1, "visual.ln_post.bias": t(64),
          "visual.proj": t(64, 32),
          "token_embedding.weight": t(100, 64),
          "positional_embedding": t(12, 64),
          "ln_final.weight": t(64) + 1, "ln_final.bias": t(64),
          "text_projection": t(64, 32),
          "logit_scale": np.asarray(2.6593, np.float32)}
    for tower, pre in (("visual.transformer", "visual/"), ("transformer", "")):
        for i in range(2):
            p = f"{tower}.resblocks.{i}"
            sd.update({
                f"{p}.ln_1.weight": t(64) + 1, f"{p}.ln_1.bias": t(64),
                f"{p}.attn.in_proj_weight": t(192, 64),
                f"{p}.attn.in_proj_bias": t(192),
                f"{p}.attn.out_proj.weight": t(64, 64),
                f"{p}.attn.out_proj.bias": t(64),
                f"{p}.ln_2.weight": t(64) + 1, f"{p}.ln_2.bias": t(64),
                f"{p}.mlp.c_fc.weight": t(256, 64), f"{p}.mlp.c_fc.bias": t(256),
                f"{p}.mlp.c_proj.weight": t(64, 256), f"{p}.mlp.c_proj.bias": t(64),
            })
    # also exercise the DDP-prefix normalization
    sd = {("module." + k): v for k, v in sd.items()}
    variables = __import__("cream_tpu.zoo", fromlist=["convert_clip"]
                           ).convert_clip(sd, vision_layers=2, text_layers=2)
    model = CLIP(cfg=cfg)
    img = jnp.zeros((2, 64, 64, 3))
    txt = jnp.ones((2, 12), jnp.int32)
    i, tt, s = model.apply(variables, img, txt)
    assert i.shape == (2, 32) and tt.shape == (2, 32)
    assert float(s) == pytest.approx(np.exp(2.6593), rel=1e-4)
