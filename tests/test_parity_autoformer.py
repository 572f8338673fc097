"""Supernet-checkpoint parity: reference Vision_TransformerSuper
(AutoFormer/model/supernet_transformer.py) with a sampled config vs our
masked AutoFormerSuper fed the same weights through
convert_autoformer_supernet — the parity-critical supernet import of
SURVEY §8.3 (one checkpoint serves all subnets)."""
import collections.abc
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models.autoformer import (
    AutoFormerSuper, SPACES, encode_config)
from cream_tpu.zoo import convert_autoformer_supernet

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_supernet_mod():
    # model/utils.py does `from torch._six import container_abcs` (removed in
    # modern torch) — stub it before importing the package.
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.container_abcs = collections.abc
        sys.modules["torch._six"] = six
    sys.path.insert(0, "/root/reference/AutoFormer")
    try:
        import model.supernet_transformer as st
        return st
    finally:
        sys.path.remove("/root/reference/AutoFormer")


@pytest.mark.parametrize("config", [
    {"layer_num": 12, "embed_dim": [216] * 12, "num_heads": [3] * 12,
     "mlp_ratio": [3.5] * 12},
    {"layer_num": 14, "embed_dim": [256] * 14, "num_heads": [4] * 14,
     "mlp_ratio": [4.0] * 14},
])
def test_autoformer_supernet_import_parity(ref_supernet_mod, config):
    space = SPACES["tiny"]
    torch.manual_seed(0)
    tmodel = ref_supernet_mod.Vision_TransformerSuper(
        img_size=224, patch_size=16, num_classes=10,
        embed_dim=space.super_embed_dim, depth=space.super_depth,
        num_heads=max(space.num_heads),
        mlp_ratio=space.super_mlp_ratio, qkv_bias=True, gp=True,
        relative_position=True, change_qkv=True, abs_pos=True,
        max_relative_position=14)
    tmodel.eval()
    # depth padding: reference pads embed_dim/heads/ratio lists to super depth
    D = space.super_depth
    tconfig = {
        "layer_num": config["layer_num"],
        "embed_dim": config["embed_dim"] + [config["embed_dim"][-1]] *
        (D - config["layer_num"]),
        "num_heads": config["num_heads"] + [max(space.num_heads)] *
        (D - config["layer_num"]),
        "mlp_ratio": config["mlp_ratio"] + [space.super_mlp_ratio] *
        (D - config["layer_num"]),
    }
    tmodel.set_sample_config(tconfig)

    x = np.random.RandomState(1).randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_autoformer_supernet(sd)
    jmodel = AutoFormerSuper(space=space, num_classes=10, drop_path_rate=0.0)
    enc = encode_config(config, space)
    out = jax.jit(lambda v, x, c: jmodel.apply(v, x, c))(
        {"params": variables["params"]}, jnp.asarray(x), enc)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-4)
