"""Resolution-change checkpoint remapping vs torch reference.

The reference bicubic-interpolates attention_biases /
relative_position_bias_table / absolute_pos_embed on shape mismatch at load
(TinyViT/utils.py:142-190). PyTorch bicubic uses A=-0.75, so parity is
checked directly against torch.nn.functional.interpolate, and end-to-end by
loading a 224-shaped TinyViT state_dict into the 384 model both ways.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.zoo import (bicubic_resize_2d, remap_leaf, remap_resolution,
                           convert_tinyvit, shape_template)
from cream_tpu.models import create_model

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


class TestBicubicParity:
    @pytest.mark.parametrize("h1,w1,h2,w2", [
        (13, 13, 23, 23),    # 224 -> 384 bias-table sizes (2*7-1 -> 2*12-1)
        (27, 27, 47, 47),    # window 14 -> 24
        (23, 23, 13, 13),    # downsample direction
        (7, 9, 15, 5),       # rectangular, mixed up/down
        (16, 16, 16, 16),    # identity
    ])
    def test_matches_torch(self, h1, w1, h2, w2):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, h1, w1)).astype(np.float32)
        got = bicubic_resize_2d(x, (h2, w2))
        want = F.interpolate(torch.from_numpy(x)[None], size=(h2, w2),
                             mode="bicubic", align_corners=False)[0].numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_leaf_rules_match_reference_code(self):
        rng = np.random.default_rng(1)
        # attention_biases (nH, L): reference views (1, nH, S, S)
        ab = rng.standard_normal((6, 169)).astype(np.float32)   # S=13
        got = remap_leaf("attention_biases", ab, (6, 529))      # S=23
        want = F.interpolate(torch.from_numpy(ab).view(1, 6, 13, 13),
                             size=(23, 23), mode="bicubic"
                             ).view(6, 529).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        # relative_position_bias_table (L, nH): permute(1,0) first
        t = rng.standard_normal((169, 4)).astype(np.float32)
        got = remap_leaf("relative_position_bias_table", t, (529, 4))
        want = F.interpolate(torch.from_numpy(t).permute(1, 0).view(1, 4, 13, 13),
                             size=(23, 23), mode="bicubic"
                             ).view(4, 529).permute(1, 0).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        # absolute_pos_embed (1, L, C)
        p = rng.standard_normal((1, 49, 32)).astype(np.float32)
        got = remap_leaf("absolute_pos_embed", p, (1, 144, 32))
        want = F.interpolate(
            torch.from_numpy(p).reshape(1, 7, 7, 32).permute(0, 3, 1, 2),
            size=(12, 12), mode="bicubic").permute(0, 2, 3, 1
                                                   ).reshape(1, 144, 32).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
class TestProgressiveResolutionLoad:
    def test_224_ckpt_loads_into_384_model(self):
        """224-shaped oracle state_dict -> 384 model, logits vs the torch
        reference remapped the reference way (utils.py load_pretrained)."""
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from torch_ref import load_ref_module, state_dict_numpy
        mod = load_ref_module("TinyViT/models/tiny_vit.py", "ref_tiny_vit_384")
        torch.manual_seed(0)
        kw = dict(embed_dims=[64, 128, 160, 320], depths=[2, 2, 6, 2],
                  num_heads=[2, 4, 5, 10], drop_path_rate=0.0,
                  num_classes=1000)
        t224 = mod.TinyViT(img_size=224, window_sizes=[7, 7, 14, 7], **kw)
        t224.eval()
        with torch.no_grad():
            for m in t224.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.7, 1.5)
        sd224 = t224.state_dict()

        # reference-side remap: interpolate attention_biases, drop idx buffers
        t384 = mod.TinyViT(img_size=384, window_sizes=[12, 12, 24, 12], **kw)
        t384.eval()
        tgt = t384.state_dict()
        remapped = {}
        for k, v in sd224.items():
            if "attention_bias_idxs" in k:
                continue
            if "attention_biases" in k and v.shape != tgt[k].shape:
                nH, L1 = v.shape
                S1, S2 = int(L1 ** 0.5), int(tgt[k].shape[1] ** 0.5)
                v = F.interpolate(v.view(1, nH, S1, S1), size=(S2, S2),
                                  mode="bicubic").view(nH, S2 * S2)
            remapped[k] = v
        missing = t384.load_state_dict(remapped, strict=False)
        assert not missing.unexpected_keys
        x = np.random.RandomState(3).randn(1, 384, 384, 3).astype(np.float32)
        with torch.no_grad():
            ref = t384(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

        # our side: convert the 224 sd, remap to the 384 model's template
        # (5m geometry at 384 — constructed directly; the registry ships the
        # released 21m_384/512 variants)
        from cream_tpu.models.tinyvit import TinyViT
        variables = convert_tinyvit(state_dict_numpy(t224))
        jmodel = TinyViT(num_classes=1000, embed_dims=(64, 128, 160, 320),
                         depths=(2, 2, 6, 2), num_heads=(2, 4, 5, 10),
                         window_sizes=(12, 12, 24, 12), drop_path_rate=0.0)
        tmpl = shape_template(jmodel, 384)
        variables = remap_resolution(variables, tmpl)
        out = jax.jit(lambda v, xx: jmodel.apply(v, xx, train=False))(
            variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-4)
