"""Pruned-TinyCLIP checkpoint import vs the live reference prune() flow.

The oracle is the reference's own model.py (loaded live): build encoders
with L0 modules, set the hard-concrete logas to definite keep/prune
patterns, run the masked forward, call the reference `.prune()`
materialization (model.py:70-820), and dump the pruned state_dict with the
auto-WI prefixes. convert_clip_pruned must reconstruct a ragged flax CLIP
whose features match the pruned torch model exactly.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models.clip import CLIP, CLIPConfig
from cream_tpu.zoo import convert_clip_pruned

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


def _build_pruned_reference():
    from argparse import Namespace
    from torch_ref import load_tinyclip_module
    mod = load_tinyclip_module()
    torch.manual_seed(0)
    vcfg = mod.CLIPVisionCfg(layers=3, width=128, head_width=64,
                             patch_size=16, image_size=64)
    tcfg = mod.CLIPTextCfg(context_length=16, vocab_size=100, width=128,
                           heads=2, layers=3)
    mask_cfg = Namespace(sparsity_warmup=1, sparsity=0.5, start_sparsity=0.0)
    img = mod.ImageEncoder(64, vcfg, quick_gelu=True, l0_module_image=True,
                           mask_cfg=mask_cfg)
    txt = mod.TextEncoder(64, tcfg, quick_gelu=True, l0_module_text=True,
                          mask_cfg=mask_cfg)
    img.eval()
    txt.eval()
    with torch.no_grad():
        for l0, keep_hidden in ((img.l0_module, 96), (txt.l0_module, 64)):
            l0.hidden_loga.fill_(10.0)
            l0.hidden_loga[keep_hidden:].fill_(-10.0)
            l0.heads_loga.fill_(10.0)
            l0.heads_loga[0, 1:].fill_(-10.0)   # layer 0: keep 1 of 2 heads
            l0.heads_loga[2, :].fill_(-10.0)    # layer 2: attn branch pruned
            l0.intermediate_loga.fill_(10.0)
            l0.intermediate_loga[1, 200:].fill_(-10.0)  # layer 1: 200 of 512
    x = torch.randn(2, 3, 64, 64)
    toks = torch.randint(1, 99, (2, 16))
    toks[:, -1] = 99                            # eot = argmax position
    with torch.no_grad():
        img(x)                                  # attaches z to submodules
        txt(toks)
        img.prune()
        txt.prune()
        img.l0_module = None
        txt.l0_module = None
        ref_img = img(x).numpy()
        ref_txt = txt(toks).numpy()

    sd = {}
    for k, v in img.state_dict().items():
        if not k.startswith("l0_module"):
            sd[f"_image_encoder.{k}"] = v.numpy()
    for k, v in txt.state_dict().items():
        if not k.startswith("l0_module"):
            sd[f"_text_encoder.{k}"] = v.numpy()
    sd["_logit_scale.logit_scale"] = np.asarray(np.log(1 / 0.07), np.float32)
    return sd, x.numpy(), toks.numpy(), ref_img, ref_txt


def test_pruned_import_matches_reference():
    sd, x, toks, ref_img, ref_txt = _build_pruned_reference()
    ragged, variables = convert_clip_pruned(sd, vision_layers=3,
                                            text_layers=3)
    assert ragged["vision_width"] == 96
    assert ragged["vision_heads"] == (1, 2, 0)
    assert ragged["vision_mlp_widths"][1] == 200
    assert ragged["text_width"] == 64

    cfg = CLIPConfig(embed_dim=ragged["embed_dim"],
                     vision_width=ragged["vision_width"], vision_layers=3,
                     vision_patch=16, image_size=64,
                     text_width=ragged["text_width"], text_layers=3,
                     context_length=16, vocab_size=100)
    model = CLIP(cfg=cfg, quick_gelu=True,
                 vision_heads=ragged["vision_heads"],
                 vision_mlp_widths=ragged["vision_mlp_widths"],
                 text_heads_per_layer=ragged["text_heads_per_layer"],
                 text_mlp_widths=ragged["text_mlp_widths"])

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    img = jax.jit(lambda v, x: model.apply(v, x, normalized=False,
                                           method=model.encode_image))(
        {"params": variables["params"]}, xj)
    txt = jax.jit(lambda v, t: model.apply(v, t, normalized=False,
                                           method=model.encode_text))(
        {"params": variables["params"]}, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(txt), ref_txt, atol=2e-4, rtol=1e-4)
