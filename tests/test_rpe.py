"""iRPE: bucketing parity vs the reference irpe.py (oracle), module forward
parity, and the DeiT+RPE model family."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.ops.rpe import (
    METHOD, bucket_ids_2d, get_rpe_config, num_buckets, piecewise_index)
from cream_tpu.nn.rpe import IRPE
from cream_tpu.models import create_model, list_models

from helpers import jit_init

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
def ref_irpe():
    _install_easydict()
    from torch_ref import load_ref_module
    return load_ref_module("iRPE/DeiT-with-iRPE/irpe.py", "irpe")


class TestBucketing:
    @pytest.mark.parametrize("method,tmethod", [
        ("product", 3), ("euc", 0), ("quant", 1), ("cross", None)])
    @pytest.mark.parametrize("skip", [0, 1])
    def test_bucket_ids_match_reference(self, ref_irpe, method, tmethod, skip):
        ratio = 1.9 if method == "product" else 20
        alpha, beta, gamma = 1 * ratio, 2 * ratio, 8 * ratio
        if method == "cross":
            methods = [(METHOD.CROSS_ROWS, ref_irpe.METHOD.CROSS_ROWS),
                       (METHOD.CROSS_COLS, ref_irpe.METHOD.CROSS_COLS)]
        else:
            methods = [(getattr(METHOD, method.upper() if method != "euc"
                                else "EUCLIDEAN"), tmethod)]
        for mine_m, ref_m in methods:
            ids, n = bucket_ids_2d(mine_m, 14, 14, skip, alpha, beta, gamma)
            ref_ids, ref_n = ref_irpe.get_bucket_ids_2d(
                method=ref_m, height=14, width=14, skip=skip,
                alpha=alpha, beta=beta, gamma=gamma)
            assert n == ref_n
            np.testing.assert_array_equal(ids, ref_ids.numpy())

    def test_product_bucket_count(self):
        # ratio 1.9 -> beta 3.8 -> beta_int 3 -> (2*3+1)^2 = 49 (+1 skip)
        assert num_buckets(METHOD.PRODUCT, 3.8, skip=0) == 49
        assert num_buckets(METHOD.PRODUCT, 3.8, skip=1) == 50

    def test_piecewise_is_identity_within_alpha(self):
        rel = np.arange(-3, 4)
        out = piecewise_index(rel, alpha=3.0, beta=6.0, gamma=24.0)
        np.testing.assert_array_equal(out, rel)


class TestIRPEModuleParity:
    @pytest.mark.parametrize("mode,transposed", [
        ("bias", True), ("contextual", True), ("contextual", False)])
    def test_forward_matches_reference(self, ref_irpe, mode, transposed):
        torch.manual_seed(0)
        H, W, skip, heads, head_dim = 7, 7, 1, 4, 8
        L = H * W + skip
        cfg = get_rpe_config(ratio=1.9, method="product", mode=mode,
                             shared_head=False, skip=skip, rpe_on="k").rpe_k

        tmod = ref_irpe.iRPE(
            head_dim=head_dim, num_heads=heads, mode=mode,
            method=ref_irpe.METHOD.PRODUCT, transposed=transposed,
            num_buckets=cfg.num_buckets,
            rpe_config=ref_irpe.get_single_rpe_config(
                ratio=1.9, method=ref_irpe.METHOD.PRODUCT, mode=mode,
                shared_head=False, skip=skip))
        # non-zero tables
        with torch.no_grad():
            for p in tmod.parameters():
                p.normal_()

        if transposed:
            x = np.random.RandomState(0).randn(2, heads, L, head_dim).astype(np.float32)
        else:
            x = np.random.RandomState(0).randn(2, heads, L, L).astype(np.float32)
        with torch.no_grad():
            ref = tmod(torch.from_numpy(x), height=H, width=W).numpy()

        jmod = IRPE(head_dim, heads, cfg, transposed=transposed)
        params = {"lookup_table_bias" if mode == "bias" else "lookup_table_weight":
                  jnp.asarray(next(iter(tmod.state_dict().values())).numpy())}
        out = jmod.apply({"params": params}, jnp.asarray(x), H, W)
        out = np.broadcast_to(np.asarray(out), ref.shape if ref.ndim == 4 else out.shape)
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_shared_head_broadcasts(self):
        cfg = get_rpe_config(ratio=1.9, method="product", mode="ctx",
                             shared_head=True, skip=1, rpe_on="k").rpe_k
        mod = IRPE(8, 4, cfg, transposed=True)
        x = jnp.ones((2, 4, 50, 8))
        v = jit_init(mod, x, 7, 7)
        out = mod.apply(v, x, 7, 7)
        assert out.shape == (2, 4, 50, 50)
        assert v["params"]["lookup_table_weight"].shape == (1, 8, 50)


class TestDeiTRPEModels:
    def test_registry(self):
        names = list_models("deit_")
        assert "deit_small_patch16_224_ctx_product_50_shared_k" in names
        assert "deit_tiny_patch16_224" in names

    def test_param_count_deit_small_rpe_k(self):
        # DeiT-S + RPE-K: ~22.1M (iRPE/README.md:27 lists 22.09M)
        model = create_model("deit_small_patch16_224_ctx_product_50_shared_k")
        v = jax.eval_shape(lambda: model.init(jax.random.key(0),
                                              jnp.zeros((1, 224, 224, 3))))
        m = sum(x.size for x in jax.tree_util.tree_leaves(v["params"])) / 1e6
        assert abs(m - 22.1) / 22.1 < 0.02, f"{m:.2f}M"

    def test_forward_and_rpe_contributes(self):
        x = jax.random.normal(jax.random.key(0), (2, 224, 224, 3))
        plain = create_model("deit_tiny_patch16_224", num_classes=10)
        rpe = create_model("deit_tiny_patch16_224_ctx_product_50_shared_qkv",
                           num_classes=10)
        vp = jit_init(plain, x)
        vr = jit_init(rpe, x)
        yp = jax.jit(lambda v, x: plain.apply(v, x))(vp, x)
        yr = jax.jit(lambda v, x: rpe.apply(v, x))(vr, x)
        assert yp.shape == yr.shape == (2, 10)
        # rpe params exist
        flat = jax.tree_util.tree_flatten_with_path(vr["params"])[0]
        assert any("rpe_k" in "/".join(str(p) for p in path) for path, _ in flat)

    def test_distilled_variant(self):
        m = create_model("deit_tiny_patch16_224", num_classes=10, distilled=True)
        x = jax.random.normal(jax.random.key(0), (2, 96, 96, 3))
        v = jit_init(m, x)
        out = jax.jit(lambda v, x: m.apply(v, x))(v, x)
        assert out.shape == (2, 10)
        a, b = m.apply(v, x, train=True,
                       rngs={"drop_path": jax.random.key(1)})
        assert a.shape == b.shape == (2, 10)
