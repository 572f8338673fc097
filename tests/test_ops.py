import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cream_tpu.ops.window import window_partition, window_reverse
from cream_tpu.ops.common import drop_path, attention_bias_indices
from cream_tpu.ops.fuse import fold_conv_bn, fold_bn_linear


class TestWindow:
    @pytest.mark.parametrize("H,W,ws", [(14, 14, 7), (7, 7, 7), (28, 28, 7), (13, 9, 7), (56, 56, 16)])
    def test_roundtrip(self, H, W, ws):
        x = jax.random.normal(jax.random.key(0), (2, H, W, 5))
        wx, padded = window_partition(x, ws)
        nH, nW = padded[0] // ws, padded[1] // ws
        assert wx.shape == (2 * nH * nW, ws * ws, 5)
        back = window_reverse(wx, ws, padded, (H, W))
        np.testing.assert_allclose(back, x, rtol=0, atol=0)

    def test_window_content(self):
        # window 0 of a 2x-window image must be the top-left tile
        x = jnp.arange(2 * 14 * 14 * 3, dtype=jnp.float32).reshape(2, 14, 14, 3)
        wx, _ = window_partition(x, 7)
        np.testing.assert_array_equal(
            wx[0].reshape(7, 7, 3), np.asarray(x[0, :7, :7, :]))


class TestDropPath:
    def test_deterministic_identity(self):
        x = jnp.ones((4, 3, 3, 2))
        np.testing.assert_array_equal(drop_path(x, 0.5, deterministic=True), x)
        np.testing.assert_array_equal(
            drop_path(x, 0.0, deterministic=False, rng=jax.random.key(0)), x)

    def test_expectation_preserved(self):
        x = jnp.ones((4096, 2))
        y = drop_path(x, 0.3, deterministic=False, rng=jax.random.key(1))
        # rows are either 0 or 1/(1-0.3)
        vals = np.unique(np.asarray(y, dtype=np.float64))
        assert all(min(abs(v - 0.0), abs(v - 1 / 0.7)) < 1e-4 for v in vals)
        assert abs(float(y.mean()) - 1.0) < 0.05


class TestAttentionBiasIndices:
    def test_small_grid(self):
        idxs, n_off = attention_bias_indices((2, 2))
        # offsets on a 2x2 grid: (0,0),(0,1),(1,0),(1,1) -> 4 buckets
        assert n_off == 4
        assert idxs.shape == (4, 4)
        assert idxs[0, 0] == 0            # self-offset is the first bucket
        assert (np.diag(idxs) == 0).all()
        # symmetric: |offset| is symmetric in (p1, p2)
        np.testing.assert_array_equal(idxs, idxs.T)

    def test_offset_count_7x7(self):
        idxs, n_off = attention_bias_indices((7, 7))
        assert idxs.shape == (49, 49)
        assert n_off == 49               # |dy| in 0..6, |dx| in 0..6


class TestFuse:
    def test_conv_bn_fold(self):
        key = jax.random.key(0)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        kernel = jax.random.normal(k1, (3, 3, 4, 8))
        gamma = jax.random.normal(k2, (8,)) * 0.1 + 1.0
        beta = jax.random.normal(k3, (8,)) * 0.1
        mean = jax.random.normal(k4, (8,)) * 0.1
        var = jax.nn.softplus(jax.random.normal(k5, (8,))) + 0.5
        x = jax.random.normal(k6, (2, 9, 9, 4))

        conv = lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y_ref = (conv(x, kernel) - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
        fk, fb = fold_conv_bn(kernel, gamma, beta, mean, var)
        y_fused = conv(x, fk) + fb
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=1e-4)

    def test_bn_linear_fold(self):
        key = jax.random.key(1)
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
        kernel = jax.random.normal(k1, (16, 10))
        bias = jax.random.normal(k2, (10,))
        gamma = jax.random.normal(k3, (16,)) * 0.1 + 1.0
        beta = jax.random.normal(k4, (16,)) * 0.1
        mean = jax.random.normal(k5, (16,)) * 0.1
        var = jax.nn.softplus(jax.random.normal(k6, (16,))) + 0.5
        x = jax.random.normal(k7, (4, 16))

        y_ref = ((x - mean) / jnp.sqrt(var + 1e-5) * gamma + beta) @ kernel + bias
        fk, fb = fold_bn_linear(kernel, bias, gamma, beta, mean, var)
        y_fused = x @ fk + fb
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=1e-4)


class TestConv1x1Dot:
    """The gated 1x1-as-dot ConvBN path (nn/layers.py DEFAULT_CONV1X1_DOT)
    must be a drop-in for the nn.Conv path: identical param tree, matching
    outputs at stride 1 and 2, and a working train-mode gradient."""

    def _pair(self, stride):
        from cream_tpu.nn.layers import ConvBN
        conv = ConvBN(12, kernel_size=1, stride=stride, conv1x1_dot=False)
        dot = ConvBN(12, kernel_size=1, stride=stride, conv1x1_dot=True)
        return conv, dot

    @pytest.mark.parametrize("stride", [1, 2])
    def test_parity_and_param_tree(self, stride):
        conv, dot = self._pair(stride)
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 6))
        vc = conv.init(jax.random.key(1), x)
        vd = dot.init(jax.random.key(1), x)
        assert jax.tree_util.tree_structure(vc) == jax.tree_util.tree_structure(vd)
        assert (vc["params"]["conv"]["kernel"].shape
                == vd["params"]["conv"]["kernel"].shape == (1, 1, 6, 12))
        y_conv = conv.apply(vc, x)
        y_dot = dot.apply(vc, x)  # SAME variables through both paths
        np.testing.assert_allclose(np.asarray(y_dot), np.asarray(y_conv),
                                   atol=2e-5, rtol=2e-5)

    def test_train_grads_match(self):
        conv, dot = self._pair(1)
        x = jax.random.normal(jax.random.key(2), (2, 8, 8, 6))
        v = conv.init(jax.random.key(3), x)

        def loss(params, mod):
            y, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, x,
                             train=True, mutable=["batch_stats"])
            return jnp.sum(y ** 2)

        gc = jax.grad(loss)(v["params"], conv)
        gd = jax.grad(loss)(v["params"], dot)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), gc, gd)
