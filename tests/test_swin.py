"""Swin lineage: standard Swin, S3 searched configs, MiniSwin multiplexing;
includes a reference-oracle parity test for the S3 WindowAttention math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model, list_models
from cream_tpu.nn.swin import (
    SwinWindowAttention, relative_position_index, shifted_window_mask)

from helpers import jit_init, n_params

torch = pytest.importorskip("torch")


class TestPrimitives:
    def test_relative_position_index_matches_reference(self):
        # oracle: the construction in AutoFormerV2/model/SSS.py:84-96
        wh = ww = 7
        coords = torch.stack(torch.meshgrid(
            [torch.arange(wh), torch.arange(ww)], indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += wh - 1
        rel[:, :, 1] += ww - 1
        rel[:, :, 0] *= 2 * ww - 1
        ref = rel.sum(-1).numpy()
        np.testing.assert_array_equal(relative_position_index(7, 7), ref)

    def test_shifted_mask_values(self):
        m = shifted_window_mask(14, 14, 7, 3)
        assert m.shape == (4, 49, 49)
        assert set(np.unique(m)) <= {0.0, -100.0}
        # first window (top-left) has no boundary: all zeros
        assert (m[0] == 0).all()

    def test_window_attention_parity_vs_torch(self):
        """Numerical oracle: reimplementation of the reference WindowAttention
        forward in torch with shared weights."""
        torch.manual_seed(0)
        dim, heads, ws, N, B = 32, 4, 4, 16, 3
        jmod = SwinWindowAttention(dim, ws, heads)
        x = np.random.RandomState(0).randn(B, N, dim).astype(np.float32)
        v = jit_init(jmod, jnp.asarray(x))
        params = v["params"]

        # torch forward with identical weights (SSS.py:107-138 semantics)
        qkv_w = torch.from_numpy(np.asarray(params["qkv"]["kernel"]).T)
        qkv_b = torch.from_numpy(np.asarray(params["qkv"]["bias"]))
        proj_w = torch.from_numpy(np.asarray(params["proj"]["kernel"]).T)
        proj_b = torch.from_numpy(np.asarray(params["proj"]["bias"]))
        table = torch.from_numpy(
            np.asarray(params["relative_position_bias_table"]))
        tx = torch.from_numpy(x)
        qkv = (tx @ qkv_w.T + qkv_b).reshape(B, N, 3, heads, dim // heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, vv = qkv[0] * (dim // heads) ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        idx = torch.from_numpy(relative_position_index(ws, ws).astype(np.int64))
        bias = table[idx.view(-1)].view(N, N, heads).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], -1)
        ref = ((attn @ vv).transpose(1, 2).reshape(B, N, dim) @ proj_w.T + proj_b)

        out = jmod.apply(v, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


class TestModels:
    def test_registry(self):
        assert len(list_models("swin_")) == 3
        assert len(list_models("s3_")) == 3
        assert len(list_models("mini_swin_")) == 3

    @pytest.mark.parametrize("name,expect_m", [
        ("swin_tiny", 28.3), ("s3_tiny", 28.0), ("mini_swin_tiny", 12.0),
        ("mini_swin_base", 46.0),
    ])
    def test_param_counts(self, name, expect_m):
        # Swin-T 28M; S3-T 28M (AutoFormerV2/README.md:50);
        # Mini-Swin-T 12M, Mini-Swin-B 46M (MiniViT/README.md:35,37)
        model = create_model(name)
        v = jax.eval_shape(lambda: model.init(jax.random.key(0),
                                              jnp.zeros((1, 224, 224, 3))))
        m = n_params(v["params"]) / 1e6
        assert abs(m - expect_m) / expect_m < 0.06, f"{name}: {m:.2f}M"

    def test_swin_forward(self):
        model = create_model("swin_tiny", num_classes=10)
        x = jax.random.normal(jax.random.key(0), (2, 224, 224, 3))
        v = jit_init(model, x)
        y = jax.jit(lambda v, x: model.apply(v, x))(v, x)
        assert y.shape == (2, 10) and bool(jnp.isfinite(y).all())

    def test_mini_swin_forward_and_sharing(self):
        model = create_model("mini_swin_tiny", num_classes=10)
        x = jax.random.normal(jax.random.key(0), (1, 224, 224, 3))
        v = jit_init(model, x)
        y = jax.jit(lambda v, x: model.apply(v, x))(v, x)
        assert y.shape == (1, 10) and bool(jnp.isfinite(y).all())
        # tiny uses share_num=6: stage 2 (depth 6) -> ONE physical block with
        # 6 per-repeat norm/transform sets but one shared attn/mlp
        p = v["params"]
        blk = p["layers_2_block_0"]
        assert "norm1_list_0" in blk and "norm1_list_5" in blk
        assert "attn" in blk and "proj_l_0" in blk and "proj_l_5" in blk
        assert "layers_2_block_1" not in p

    def test_s3_forward(self):
        model = create_model("s3_tiny", num_classes=10)
        x = jax.random.normal(jax.random.key(0), (1, 224, 224, 3))
        v = jit_init(model, x)
        y = jax.jit(lambda v, x: model.apply(v, x))(v, x)
        assert y.shape == (1, 10) and bool(jnp.isfinite(y).all())


class TestNonDivisibleShift:
    def test_swin_attend_pads_before_masking(self):
        """Shifted attention at resolutions not divisible by the window must
        pad first and mask on the padded grid (ADVICE r1) — previously a
        trace-time crash."""
        from cream_tpu.nn.swin import SwinWindowAttention, swin_attend

        attn = SwinWindowAttention(dim=32, window=7, num_heads=4)
        x = jnp.asarray(np.random.default_rng(0).random((2, 10, 10, 32)),
                        jnp.float32)
        v = attn.init(jax.random.key(0),
                      jnp.zeros((2 * 4, 49, 32)))  # 10->14 padded: 4 windows

        def run(x):
            return swin_attend(x, lambda wx, mask, proj_l, proj_w, train=False:
                               attn.apply(v, wx, mask=mask), 7, 3)
        y = jax.jit(run)(x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
