"""CDARTS released-retrain-checkpoint compatibility vs the live reference.

Oracle: the reference's own ModelTest stack (lib/models/model_test.py +
augment_cells.py + ops.py + genotypes.py, loaded live), built exactly like
CDARTS/CDARTS/test.py:72-86 from the shipped cells/*.json genotypes. Its
state_dict goes through convert_cdarts_retrain and both forwards compare.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model
from cream_tpu.zoo.import_torch import convert_cdarts_retrain

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

_CELLS = "/root/reference/CDARTS/CDARTS/cells"


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)


@pytest.mark.parametrize("cells_json,model_type,img,classes", [
    ("imagenet_genotype.json", "imagenet", 64, 1000),
    ("cifar_genotype.json", "cifar", 32, 10),
])
def test_retrain_matches_reference(cells_json, model_type, img, classes):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref import load_cdarts_model_test
    mod = load_cdarts_model_test()
    import lib.utils.genotypes as gt

    r_dict = json.loads(open(f"{_CELLS}/{cells_json}").read())
    genotypes_dict = {int(k): gt.from_str(v) for k, v in r_dict.items()}
    torch.manual_seed(0)
    init_c = 16
    tmodel = mod.ModelTest(genotypes_dict, model_type, res_stem=False,
                           init_channel=init_c, stem_multiplier=3,
                           n_nodes=4, num_classes=classes)
    tmodel.eval()
    _randomize_bn(tmodel)
    x = np.random.RandomState(1).randn(2, img, img, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))[0].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    name = ("cdarts_retrain_imagenet" if model_type == "imagenet"
            else "cdarts_retrain_cifar")
    jmodel = create_model(name, genotypes=r_dict, num_classes=classes,
                          init_channels=init_c)
    variables = convert_cdarts_retrain(sd, jmodel.genotypes,
                                       model_type=model_type)
    out = jax.jit(lambda v, xx: jmodel.apply(v, xx, train=False))(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-4)
