"""Numerical parity vs the reference PyTorch models (random-init oracles).

The reference model file is loaded with a timm stub, instantiated with random
weights, its state_dict imported via cream_tpu.zoo, and both forwards compared
on the same input. This is the strongest checkpoint-compatibility test
available without network access to the released .pth files.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model
from cream_tpu.zoo import convert_tinyvit, convert_efficientvit

from torch_ref import load_ref_module, state_dict_numpy

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tinyvit_ref():
    return load_ref_module("TinyViT/models/tiny_vit.py", "ref_tiny_vit")


@pytest.fixture(scope="module")
def evit_ref():
    return load_ref_module(
        "EfficientViT/classification/model/efficientvit.py", "ref_efficientvit")


class TestTinyViTParity:
    def test_forward_matches_reference(self, tinyvit_ref):
        torch.manual_seed(0)
        tmodel = tinyvit_ref.TinyViT(
            img_size=224, embed_dims=[64, 128, 160, 320], depths=[2, 2, 6, 2],
            num_heads=[2, 4, 5, 10], window_sizes=[7, 7, 14, 7],
            drop_path_rate=0.0, num_classes=1000)
        tmodel.eval()
        # give BN stats + biases non-trivial values so folding bugs can't hide
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.7, 1.5)
                    m.weight.uniform_(0.8, 1.2)
                    m.bias.uniform_(-0.1, 0.1)

        x = np.random.RandomState(1).randn(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

        variables = convert_tinyvit(state_dict_numpy(tmodel))
        jmodel = create_model("tiny_vit_5m_224")
        out = jax.jit(lambda v, x: jmodel.apply(v, x))(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


class TestEfficientViTParity:
    def test_forward_matches_reference(self, evit_ref):
        torch.manual_seed(0)
        tmodel = evit_ref.EfficientViT(
            img_size=224, patch_size=16, embed_dim=[64, 128, 192],
            depth=[1, 2, 3], num_heads=[4, 4, 4], window_size=[7, 7, 7],
            kernels=[5, 5, 5, 5], num_classes=1000)
        tmodel.eval()
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.7, 1.5)
                    m.weight.uniform_(0.8, 1.2)
                    m.bias.uniform_(-0.1, 0.1)

        x = np.random.RandomState(2).randn(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

        variables = convert_efficientvit(state_dict_numpy(tmodel))
        jmodel = create_model("efficientvit_m0")
        out = jax.jit(lambda v, x: jmodel.apply(v, x))(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)
