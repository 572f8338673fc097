"""Custom-VJP depthwise 3x3 conv == XLA autodiff of the plain conv.

The op (ops/dwconv.py) exists purely for TPU backward-pass layout reasons;
its contract is bitwise-identical forward and numerically-identical
gradients vs `lax.conv_general_dilated` + jax autodiff.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cream_tpu.ops.dwconv import dw_conv3x3


def _ref(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


class TestDWConvVJP:
    def setup_method(self):
        k = jax.random.key(0)
        kx, kw, kd = jax.random.split(k, 3)
        self.x = jax.random.normal(kx, (3, 9, 11, 8), jnp.float32)
        self.w = jax.random.normal(kw, (3, 3, 1, 8), jnp.float32)
        self.dy_seed = kd

    def test_forward_bitwise(self):
        got = jax.jit(dw_conv3x3)(self.x, self.w)
        want = jax.jit(_ref)(self.x, self.w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_gradients_match_autodiff(self):
        dy = jax.random.normal(self.dy_seed, self.x.shape, jnp.float32)

        def loss(fn, x, w):
            return jnp.sum(fn(x, w) * dy)

        gx, gw = jax.jit(jax.grad(lambda x, w: loss(dw_conv3x3, x, w),
                                  argnums=(0, 1)))(self.x, self.w)
        rx, rw = jax.jit(jax.grad(lambda x, w: loss(_ref, x, w),
                                  argnums=(0, 1)))(self.x, self.w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-6, atol=1e-5)

    def test_grad_through_chain(self):
        # second application + nonlinearity: vjp composes like any other op
        def f(fn, x, w):
            y = fn(x, w)
            return jnp.sum(jnp.tanh(fn(y, w)))

        got = jax.jit(jax.grad(lambda x, w: f(dw_conv3x3, x, w),
                               argnums=(0, 1)))(self.x, self.w)
        want = jax.jit(jax.grad(lambda x, w: f(_ref, x, w),
                                argnums=(0, 1)))(self.x, self.w)
        for g, r in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-5, atol=1e-5)

    def test_bf16_inputs(self):
        x = self.x.astype(jnp.bfloat16)
        w = self.w  # params stay fp32, op casts
        got = jax.jit(dw_conv3x3)(x, w)
        want = jax.jit(_ref)(x, w.astype(jnp.bfloat16))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestDWConvFusedPallas:
    """Fused Pallas fwd+bwd (interpret mode) == XLA conv + autodiff.

    Covers the channel-block split (C=384 -> 3x128 blocks at 56x56), a
    non-128-multiple C (576, whole-block), and odd spatial sizes."""

    def _case(self, B, H, W, C):
        from cream_tpu.ops.dwconv import dw_conv3x3_fused
        k = jax.random.key(hash((B, H, W, C)) % (2**31))
        kx, kw, kd = jax.random.split(k, 3)
        x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
        w = jax.random.normal(kw, (3, 3, 1, C), jnp.float32)
        dy = jax.random.normal(kd, (B, H, W, C), jnp.float32)

        fused = lambda a, b: dw_conv3x3_fused(a, b, True)
        y = jax.jit(fused)(x, w)
        yr = jax.jit(_ref)(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=2e-5, atol=2e-5)

        def loss(fn, x, w):
            return jnp.sum(fn(x, w) * dy)
        gx, gw = jax.jit(jax.grad(lambda x, w: loss(fused, x, w),
                                  argnums=(0, 1)))(x, w)
        rx, rw = jax.jit(jax.grad(lambda x, w: loss(_ref, x, w),
                                  argnums=(0, 1)))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-3)

    def test_odd_small(self):
        self._case(2, 9, 11, 8)

    def test_stride2_parity(self):
        """Stride-2 phase-split kernel == XLA conv + autodiff (fwd, dx, dw)."""
        from cream_tpu.ops.dwconv import _dw2_fwd_raw, dw_conv3x3s2_fused
        for (B, H, W, C) in [(2, 8, 12, 8), (2, 28, 28, 192)]:
            k = jax.random.key(hash((B, H, W, C, 2)) % (2**31))
            kx, kw, kd = jax.random.split(k, 3)
            x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
            w = jax.random.normal(kw, (3, 3, 1, C), jnp.float32)
            yr = jax.jit(_dw2_fwd_raw)(x, w)
            dy = jax.random.normal(kd, yr.shape, jnp.float32)
            fused = lambda a, b: dw_conv3x3s2_fused(a, b, True)
            np.testing.assert_allclose(np.asarray(jax.jit(fused)(x, w)),
                                       np.asarray(yr), rtol=2e-5, atol=2e-5)

            def loss(fn, x, w):
                return jnp.sum(fn(x, w) * dy)
            gx, gw = jax.jit(jax.grad(lambda x, w: loss(fused, x, w),
                                      argnums=(0, 1)))(x, w)
            rx, rw = jax.jit(jax.grad(lambda x, w: loss(_dw2_fwd_raw, x, w),
                                      argnums=(0, 1)))(x, w)
            np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                       rtol=1e-4, atol=1e-3)

    def test_stride2_odd_falls_back(self):
        # odd spatial sizes are out of the phase-split contract -> XLA conv
        from cream_tpu.ops.dwconv import dw_conv3x3s2_fused, _dw2_fwd_raw
        x = jax.random.normal(jax.random.key(1), (1, 9, 9, 8), jnp.float32)
        w = jax.random.normal(jax.random.key(2), (3, 3, 1, 8), jnp.float32)
        got = jax.jit(lambda a, b: dw_conv3x3s2_fused(a, b, True))(x, w)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(jax.jit(_dw2_fwd_raw)(x, w)))

    def test_tpu_lowering(self):
        """AOT-lower both kernels for the TPU platform (no device needed).

        This exercises the Pallas->Mosaic lowering stage, which is where
        unsupported primitives surface (e.g. an .at[].add accumulator lowers
        to scatter-add, unimplemented in the Mosaic TC pipeline) — catching
        them without a TPU round-trip."""
        from cream_tpu.ops.dwconv import (_pallas_bwd, _pallas_bwd2,
                                          _pallas_fwd, _pallas_fwd2)
        for shape in [(2, 56, 56, 384), (2, 7, 7, 576)]:
            x = jnp.zeros(shape, jnp.bfloat16)
            w9 = jnp.zeros((9, shape[-1]), jnp.bfloat16)
            jax.jit(lambda x, w: _pallas_fwd(x, w, False)).trace(
                x, w9).lower(lowering_platforms=("tpu",))
            jax.jit(lambda x, d, w: _pallas_bwd(x, d, w, False)).trace(
                x, x, w9).lower(lowering_platforms=("tpu",))
        x = jnp.zeros((2, 56, 56, 192), jnp.bfloat16)
        w9 = jnp.zeros((9, 192), jnp.bfloat16)
        dy = jnp.zeros((2, 28, 28, 192), jnp.bfloat16)
        jax.jit(lambda x, w: _pallas_fwd2(x, w, False)).trace(
            x, w9).lower(lowering_platforms=("tpu",))
        jax.jit(lambda x, d, w: _pallas_bwd2(x, d, w, False)).trace(
            x, dy, w9).lower(lowering_platforms=("tpu",))

    def test_whole_block_c576(self):
        self._case(3, 7, 7, 576)

    def test_channel_split_stage0(self):
        # 56x56x384 picks a 128-channel block (3 C-blocks) — the split path
        self._case(2, 56, 56, 384)


class TestDWConvWgradOnly:
    """Mixed VJP ("wgrad" mode): XLA fwd/dx + Pallas weight-grad kernel.

    Verifies the surgical variant that keeps XLA's conv fusions and replaces
    only the batch-group wgrad (interpret mode == XLA autodiff numerics)."""

    def _case_s1(self, B, H, W, C):
        from cream_tpu.ops.dwconv import dw_conv3x3_wg
        k = jax.random.key(hash((B, H, W, C, 3)) % (2**31))
        kx, kw, kd = jax.random.split(k, 3)
        x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
        w = jax.random.normal(kw, (3, 3, 1, C), jnp.float32)
        dy = jax.random.normal(kd, (B, H, W, C), jnp.float32)

        wg = lambda a, b: dw_conv3x3_wg(a, b, True)
        np.testing.assert_array_equal(
            np.asarray(jax.jit(wg)(x, w)), np.asarray(jax.jit(_ref)(x, w)))

        def loss(fn, x, w):
            return jnp.sum(fn(x, w) * dy)
        gx, gw = jax.jit(jax.grad(lambda x, w: loss(wg, x, w),
                                  argnums=(0, 1)))(x, w)
        rx, rw = jax.jit(jax.grad(lambda x, w: loss(_ref, x, w),
                                  argnums=(0, 1)))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-3)

    def test_s1_odd_small(self):
        self._case_s1(2, 9, 11, 8)

    def test_s1_channel_split(self):
        self._case_s1(2, 56, 56, 384)

    # test_s2 (stride-2 Pallas wgrad) removed with the kernel: it passed in
    # every isolated shape yet the kernel faulted the TPU worker in the full
    # train graph — excised round 5, see ISSUES.md #1.

    def test_tpu_lowering(self):
        from cream_tpu.ops.dwconv import _pallas_wgrad
        x = jnp.zeros((2, 56, 56, 384), jnp.bfloat16)
        jax.jit(lambda x, d: _pallas_wgrad(x, d)).trace(
            x, x).lower(lowering_platforms=("tpu",))
