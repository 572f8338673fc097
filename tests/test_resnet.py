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
