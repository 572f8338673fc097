"""ResNet families: CLIP ModifiedResNet full-tower parity vs the reference
(torch, run live), frozen-BN backbone behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cream_tpu.models.resnet import (FrozenBatchNorm, ModifiedResNet,
                                     ResNetBackbone)
from cream_tpu.zoo.import_torch import convert_clip_resnet_tower

from torch_ref import load_ref_module, state_dict_numpy


class TestModifiedResNetParity:
    def test_full_tower_parity(self):
        """Random-init reference ModifiedResNet (RN26-ish tiny config) ==
        imported flax tower, eval mode, atol 1e-4."""
        ref_mod = load_ref_module("TinyCLIP/src/open_clip/resnet.py",
                                  "ref_clip_resnet")
        torch.manual_seed(0)
        layers = (1, 1, 1, 1)
        ref = ref_mod.ModifiedResNet(layers=list(layers), output_dim=128,
                                     heads=8, image_size=64, width=32).eval()
        # randomize BN stats so eval-mode normalization is actually tested
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.uniform_(-0.2, 0.2)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()

        ours = ModifiedResNet(layers=layers, output_dim=128, heads=8,
                              image_size=64, width=32)
        variables = convert_clip_resnet_tower(state_dict_numpy(ref), layers)
        got = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-4,
                                   rtol=1e-3)

    def test_visual_prefix_accepted(self):
        ref_mod = load_ref_module("TinyCLIP/src/open_clip/resnet.py",
                                  "ref_clip_resnet2")
        torch.manual_seed(1)
        ref = ref_mod.ModifiedResNet(layers=[1, 1, 1, 1], output_dim=64,
                                     heads=4, image_size=32, width=16).eval()
        sd = {f"visual.{k}": v for k, v in state_dict_numpy(ref).items()}
        variables = convert_clip_resnet_tower(sd, (1, 1, 1, 1))
        ours = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=64, heads=4,
                              image_size=32, width=16)
        x = jnp.zeros((1, 32, 32, 3))
        out = ours.apply(variables, x)
        assert out.shape == (1, 64)


class TestFrozenBN:
    def test_constants_not_trainable(self):
        m = FrozenBatchNorm(4)
        v = m.init(jax.random.key(0), jnp.zeros((1, 2, 2, 4)))
        assert "params" not in v           # nothing for an optimizer
        assert set(v["constants"]) == {"scale", "bias", "mean", "var"}
        c = {"constants": {"scale": jnp.full((4,), 2.0),
                           "bias": jnp.full((4,), 1.0),
                           "mean": jnp.full((4,), 3.0),
                           "var": jnp.full((4,), 4.0)}}
        x = jnp.full((1, 1, 1, 4), 5.0)
        got = m.apply(c, x)
        expect = (5.0 - 3.0) / np.sqrt(4.0 + 1e-5) * 2.0 + 1.0
        np.testing.assert_allclose(np.asarray(got)[0, 0, 0], expect,
                                   rtol=1e-5)

    def test_backbone_shapes_and_mask(self):
        bb = ResNetBackbone((1, 1, 1, 1), "basic")
        img = jnp.zeros((2, 64, 96, 3))
        mask = jnp.zeros((2, 64, 96), bool).at[1, :, 48:].set(True)
        v = jax.jit(lambda r: bb.init(r, img, mask))(jax.random.key(0))
        feat, dmask = bb.apply(v, img, mask)
        assert feat.shape == (2, 2, 3, 512)
        assert dmask.shape == (2, 2, 3)
        assert bool(dmask[1, 0, -1]) and not bool(dmask[0, 0, 0])


class TestCLIPResNetTwoTower:
    def test_forward_and_importer_structure(self):
        """CLIPResNet runs end-to-end from an imported RN-layout state dict
        whose visual half comes from the parity-tested reference tower."""
        from cream_tpu.models.resnet import CLIPResNet
        from cream_tpu.zoo.import_torch import convert_clip_rn

        ref_mod = load_ref_module("TinyCLIP/src/open_clip/resnet.py",
                                  "ref_clip_resnet3")
        torch.manual_seed(2)
        layers = (1, 1, 1, 1)
        W, E, TW, TL = 32, 64, 64, 2
        vis = ref_mod.ModifiedResNet(layers=list(layers), output_dim=E,
                                     heads=8, image_size=64, width=W).eval()
        sd = {f"visual.{k}": v for k, v in state_dict_numpy(vis).items()}
        # synthesize the text half in the OpenAI layout
        rng = np.random.default_rng(0)
        sd["token_embedding.weight"] = rng.standard_normal(
            (100, TW)).astype(np.float32) * 0.02
        sd["positional_embedding"] = rng.standard_normal(
            (16, TW)).astype(np.float32) * 0.01
        for i in range(TL):
            tp = f"transformer.resblocks.{i}"
            sd[f"{tp}.ln_1.weight"] = np.ones(TW, np.float32)
            sd[f"{tp}.ln_1.bias"] = np.zeros(TW, np.float32)
            sd[f"{tp}.attn.in_proj_weight"] = rng.standard_normal(
                (3 * TW, TW)).astype(np.float32) * 0.05
            sd[f"{tp}.attn.in_proj_bias"] = np.zeros(3 * TW, np.float32)
            sd[f"{tp}.attn.out_proj.weight"] = rng.standard_normal(
                (TW, TW)).astype(np.float32) * 0.05
            sd[f"{tp}.attn.out_proj.bias"] = np.zeros(TW, np.float32)
            sd[f"{tp}.ln_2.weight"] = np.ones(TW, np.float32)
            sd[f"{tp}.ln_2.bias"] = np.zeros(TW, np.float32)
            sd[f"{tp}.mlp.c_fc.weight"] = rng.standard_normal(
                (4 * TW, TW)).astype(np.float32) * 0.05
            sd[f"{tp}.mlp.c_fc.bias"] = np.zeros(4 * TW, np.float32)
            sd[f"{tp}.mlp.c_proj.weight"] = rng.standard_normal(
                (TW, 4 * TW)).astype(np.float32) * 0.05
            sd[f"{tp}.mlp.c_proj.bias"] = np.zeros(TW, np.float32)
        sd["ln_final.weight"] = np.ones(TW, np.float32)
        sd["ln_final.bias"] = np.zeros(TW, np.float32)
        sd["text_projection"] = rng.standard_normal(
            (TW, E)).astype(np.float32) * 0.05
        sd["logit_scale"] = np.asarray([np.log(1 / 0.07)], np.float32)

        model = CLIPResNet(layers=layers, embed_dim=E, heads=8,
                           image_size=64, width=W, text_width=TW,
                           text_layers=TL, text_heads=1, context_length=16,
                           vocab_size=100)
        variables = convert_clip_rn(sd, layers, TL)
        img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
        txt = jnp.asarray(rng.integers(1, 99, (2, 16)))
        img_f, txt_f, scale = model.apply(variables, img, txt)
        assert img_f.shape == (2, E) and txt_f.shape == (2, E)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(img_f), axis=-1),
                                   1.0, rtol=1e-5)
        # visual half must agree with the reference tower exactly
        with torch.no_grad():
            ref_feat = vis(torch.tensor(
                np.asarray(img).transpose(0, 3, 1, 2))).numpy()
        ref_feat /= np.linalg.norm(ref_feat, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(img_f), ref_feat, atol=1e-4,
                                   rtol=1e-3)
        assert float(scale) == pytest.approx(1 / 0.07, rel=1e-5)
