"""Released-Cream-childnet checkpoint compatibility vs the live reference.

The oracle is the reference's own childnet stack (Cream/lib/models/
structures/childnet.py + build_childnet.py + builder_util.py + the vendored
IR block, loaded with a timm stub), instantiated exactly like
Cream/tools/test.py:79-97 builds the released Cream_14..604 models. Its
state_dict goes through convert_cream_childnet and both forwards compare.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model
from cream_tpu.models.cream import RELEASED_CHILDNETS
from cream_tpu.zoo import convert_cream_childnet

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

# Cream/tools/test.py:80-90
_STEM = ['ds_r1_k3_s1_e1_c16_se0.25', 'cn_r1_k1_s1_c320_se0.25']
_POOL = ['ir_r1_k3_s2_e4_c24_se0.25', 'ir_r1_k5_s2_e4_c40_se0.25',
         'ir_r1_k3_s2_e6_c80_se0.25', 'ir_r1_k3_s1_e6_c96_se0.25',
         'ir_r1_k5_s2_e6_c192_se0.25']


def build_reference_childnet(arch_list):
    from torch_ref import load_cream_childnet_module
    mod = load_cream_childnet_module()
    arch_def = [[_STEM[0]]] + \
        [[_POOL[i] for _ in range(len(arch_list[i + 1]))]
         for i in range(len(_POOL))] + [[_STEM[1]]]
    return mod.gen_childnet(arch_list, arch_def, num_classes=1000,
                            drop_rate=0.0, global_pool='avg')


@pytest.mark.parametrize("name,img", [("cream_14", 64), ("cream_481", 96)])
def test_childnet_matches_reference(name, img):
    arch = RELEASED_CHILDNETS[name]
    arch_list = [[0]] + [list(s) for s in arch] + [[0]]
    torch.manual_seed(0)
    tmodel = build_reference_childnet(arch_list)
    tmodel.eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    x = np.random.RandomState(1).randn(2, img, img, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_cream_childnet(sd, arch)
    jmodel = create_model(name)
    out = jax.jit(lambda v, xx: jmodel.apply(v, xx, train=False))(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)
