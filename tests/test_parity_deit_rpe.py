"""Full-model parity: reference DeiT+iRPE ViT vs our RPEVisionTransformer,
through the checkpoint importer."""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model
from cream_tpu.zoo import convert_deit_rpe

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


def _install_easydict():
    if "easydict" in sys.modules:
        return
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


@pytest.fixture(scope="module")
def ref_vit():
    _install_easydict()
    from torch_ref import load_ref_module
    load_ref_module("iRPE/DeiT-with-iRPE/irpe.py", "irpe")
    return load_ref_module(
        "iRPE/DeiT-with-iRPE/rpe_vision_transformer.py", "ref_rpe_vit")


@pytest.mark.parametrize("rpe_on", ["k", "qkv"])
def test_deit_tiny_rpe_parity(ref_vit, rpe_on):
    import irpe

    torch.manual_seed(0)
    rpe_config = irpe.get_rpe_config(ratio=1.9, method="product", mode="ctx",
                                     shared_head=True, skip=1, rpe_on=rpe_on)
    tmodel = ref_vit.VisionTransformer(
        img_size=224, patch_size=16, embed_dim=192, depth=12, num_heads=3,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        rpe_config=rpe_config)
    tmodel.eval()
    with torch.no_grad():  # non-zero rpe tables (init is zeros)
        for n, p in tmodel.named_parameters():
            if "lookup_table" in n:
                p.normal_(std=0.05)

    x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_deit_rpe(sd)
    jmodel = create_model(f"deit_tiny_patch16_224_ctx_product_50_shared_{rpe_on}")
    out = jax.jit(lambda v, x: jmodel.apply(v, x))(
        {"params": variables["params"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-4)
