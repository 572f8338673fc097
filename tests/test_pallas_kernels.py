"""Pallas kernels vs jnp oracles (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.ops.pallas.bias_attention import fused_bias_attention


def ref_attention(q, k, v, bias):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("whnd,whmd->whnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale + bias[None]
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("whnm,whmd->whnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


class TestFusedBiasAttention:
    @pytest.mark.parametrize("W,h,N,d", [
        (8, 4, 49, 32),     # TinyViT stage-1/3 window
        (5, 3, 16, 16),     # EfficientViT 4x4 window
        (4, 2, 196, 32),    # window-14 stage (lane-padded inside)
    ])
    def test_matches_reference(self, W, h, N, d):
        ks = jax.random.split(jax.random.key(0), 4)
        q = jax.random.normal(ks[0], (W, h, N, d))
        k = jax.random.normal(ks[1], (W, h, N, d))
        v = jax.random.normal(ks[2], (W, h, N, d))
        bias = jax.random.normal(ks[3], (h, N, N))
        out = fused_bias_attention(q, k, v, bias, interpret=True)
        want = ref_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-4, rtol=1e-3)

    def test_window_padding(self):
        # W not a multiple of the tile: padded windows must not leak
        ks = jax.random.split(jax.random.key(1), 4)
        W, h, N, d = 7, 2, 49, 32
        q = jax.random.normal(ks[0], (W, h, N, d))
        k = jax.random.normal(ks[1], (W, h, N, d))
        v = jax.random.normal(ks[2], (W, h, N, d))
        bias = jax.random.normal(ks[3], (h, N, N))
        out = fused_bias_attention(q, k, v, bias, interpret=True)
        assert out.shape == (W, h, N, d)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref_attention(q, k, v, bias)),
                                   atol=2e-4, rtol=1e-3)


from cream_tpu.ops.pallas.window_attention import fused_window_attention
from cream_tpu.ops.pallas.window_relayout import (window_partition_pallas,
                                                  window_reverse_pallas)
from cream_tpu.ops.window import window_partition, window_reverse


def ref_window_attention(qkv, bias, window, heads, kd, dv,
                         layout="head_major"):
    B, H, W, L = qkv.shape
    w, p = window_partition(qkv, window)
    Wn, N, _ = w.shape
    if layout == "qkv_major":
        assert kd == dv
        w = w.reshape(Wn, N, 3, heads, kd)
        q, k, v = w[:, :, 0], w[:, :, 1], w[:, :, 2]
    else:
        w = w.reshape(Wn, N, heads, 2 * kd + dv)
        q, k, v = jnp.split(w, [kd, 2 * kd], axis=-1)
    a = jnp.einsum("bnhk,bmhk->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (kd ** -0.5)
    a = jax.nn.softmax(a + bias[None], axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", a,
                   v.astype(jnp.float32)).astype(qkv.dtype)
    return window_reverse(o.reshape(Wn, N, heads * dv), window, p, (H, W))


class TestFusedWindowAttention:
    """The no-transpose NHWC window-attention kernel (windowing in-kernel)."""

    @pytest.mark.parametrize("B,H,W,ws,heads,kd,dv", [
        (2, 28, 28, 7, 6, 32, 32),     # TinyViT-21M stage 1
        (2, 14, 14, 14, 12, 32, 32),   # stage 2 (single global window)
        (1, 7, 7, 7, 18, 32, 32),      # stage 3
        (1, 14, 21, 7, 3, 16, 32),     # rectangular map, kd != dv
    ])
    def test_matches_reference(self, B, H, W, ws, heads, kd, dv):
        rng = np.random.default_rng(0)
        L = heads * (2 * kd + dv)
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * .5,
                           jnp.float32)
        got = fused_window_attention(qkv, bias, window=ws, heads=heads, kd=kd,
                                     dv=dv, interpret=True)
        want = ref_window_attention(qkv, bias, ws, heads, kd, dv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_bf16(self):
        rng = np.random.default_rng(1)
        qkv = jnp.asarray(rng.standard_normal((2, 14, 14, 6 * 96)),
                          jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((6, 49, 49)), jnp.float32)
        got = fused_window_attention(qkv, bias, window=7, heads=6, kd=32,
                                     dv=32, interpret=True)
        want = ref_window_attention(qkv, bias, 7, 6, 32, 32)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2)


class TestWindowRelayout:
    @pytest.mark.parametrize("B,H,W,ws,C", [
        (2, 28, 28, 7, 192), (3, 14, 14, 7, 64), (1, 24, 24, 12, 96),
    ])
    def test_roundtrip(self, B, H, W, ws, C):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        got = window_partition_pallas(x, ws, interpret=True)
        want, _ = window_partition(x, ws)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        back = window_reverse_pallas(got, ws, (H, W), interpret=True)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_qkv_major_layout_with_mask(self):
        """Swin packing ([q all|k all|v all]) + shifted-window additive mask."""
        rng = np.random.default_rng(2)
        B, H, W, ws, heads, d = 2, 14, 14, 7, 4, 16
        L = heads * 3 * d
        N = ws * ws
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, N, N)) * .5, jnp.float32)
        mask = jnp.asarray(
            np.where(rng.random((4, N, N)) > .7, -100.0, 0.0), jnp.float32)
        got = fused_window_attention(qkv, bias, mask, window=ws, heads=heads,
                                     kd=d, dv=d, layout="qkv_major",
                                     interpret=True)
        # reference: split per swin packing
        w, p = window_partition(qkv, ws)
        Wn = w.shape[0]
        w = w.reshape(Wn, N, 3, heads, d)
        q, k, v = w[:, :, 0], w[:, :, 1], w[:, :, 2]
        a = jnp.einsum("bnhk,bmhk->bhnm", q, k) * (d ** -0.5)
        a = a + bias[None]
        a = a.reshape(B, 4, heads, N, N) + mask[None, :, None]
        a = jax.nn.softmax(a.reshape(Wn, heads, N, N), axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(Wn, N, heads * d)
        want = window_reverse(o, ws, p, (H, W))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


class TestFusedWindowAttentionBackward:
    """custom_vjp bwd kernel vs jax.grad of the einsum oracle."""

    @pytest.mark.parametrize("B,H,W,ws,heads,kd,dv", [
        (2, 14, 14, 7, 3, 16, 32),     # small, kd != dv, 4 windows
        (1, 14, 14, 14, 4, 32, 32),    # single global window, KP>N path
    ])
    def test_grads_match_reference(self, B, H, W, ws, heads, kd, dv):
        rng = np.random.default_rng(7)
        L = heads * (2 * kd + dv)
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * .5,
                           jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((B, H, W, heads * dv)),
                          jnp.float32)

        def loss_fused(qkv, bias):
            o = fused_window_attention(qkv, bias, window=ws, heads=heads,
                                       kd=kd, dv=dv, interpret=True)
            return jnp.sum(o * wgt)

        def loss_ref(qkv, bias):
            o = ref_window_attention(qkv, bias, ws, heads, kd, dv)
            return jnp.sum(o * wgt)

        gq, gb = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
        rq, rb = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   atol=2e-4, rtol=1e-3)

    def test_grads_qkv_major_with_mask(self):
        rng = np.random.default_rng(8)
        B, H, W, ws, heads, d = 2, 14, 14, 7, 4, 16
        L = heads * 3 * d
        N = ws * ws
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, N, N)) * .5, jnp.float32)
        mask = jnp.asarray(
            np.where(rng.random((4, N, N)) > .7, -100.0, 0.0), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((B, H, W, heads * d)),
                          jnp.float32)

        def loss_fused(qkv, bias):
            o = fused_window_attention(qkv, bias, mask, window=ws, heads=heads,
                                       kd=d, dv=d, layout="qkv_major",
                                       interpret=True)
            return jnp.sum(o * wgt)

        def loss_ref(qkv, bias):
            w, p = window_partition(qkv, ws)
            Wn = w.shape[0]
            w = w.reshape(Wn, N, 3, heads, d)
            q, k, v = w[:, :, 0], w[:, :, 1], w[:, :, 2]
            a = jnp.einsum("bnhk,bmhk->bhnm", q, k) * (d ** -0.5)
            a = a + bias[None]
            a = a.reshape(B, 4, heads, N, N) + mask[None, :, None]
            a = jax.nn.softmax(a.reshape(Wn, heads, N, N), axis=-1)
            o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(Wn, N, heads * d)
            return jnp.sum(window_reverse(o, ws, p, (H, W)) * wgt)

        gq, gb = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
        rq, rb = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   atol=2e-4, rtol=1e-3)


class TestSoftmaxRangeGuard:
    """The 'safe' MXU softmax must stay exact where the round-4 max-free
    form fails: attention logits beyond the |s| <= 60 window it assumed
    (trained models can grow attention logits well past random-init scales —
    the reason qk-layernorm exists). Exercises both hazards from the round-4
    advisor finding: max logit > 60 (silent flattening) and all logits below
    -87 (exp underflow -> 0-sum -> NaN)."""

    def _run(self, mode, qkv, bias, ws, heads, kd, dv):
        import cream_tpu.ops.pallas.window_attention as wa
        old = wa.MXU_SOFTMAX
        wa.MXU_SOFTMAX = mode
        try:
            jax.clear_caches()   # the inner jit cached the previous mode
            return fused_window_attention(qkv, bias, window=ws, heads=heads,
                                          kd=kd, dv=dv, interpret=True)
        finally:
            wa.MXU_SOFTMAX = old
            jax.clear_caches()

    @pytest.mark.parametrize("mode", [False, "safe"],
                             ids=["default-exact", "safe"])
    @pytest.mark.parametrize("shift", [+90.0, -120.0])
    def test_exact_at_extreme_logit_scales(self, mode, shift):
        # bias shifts every logit by `shift`: +90 puts row maxima past the
        # max-free clamp at 60; -120 puts them past fp32 exp underflow.
        # `False` is the shipped default — this pins that the DEFAULT path
        # has no logit-range hazard.
        rng = np.random.default_rng(11)
        B, H, W, ws, heads, kd, dv = 1, 14, 14, 7, 3, 32, 32
        L = heads * (2 * kd + dv)
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws))
                           + shift, jnp.float32)
        want = np.asarray(ref_window_attention(qkv, bias, ws, heads, kd, dv))
        got = np.asarray(self._run(mode, qkv, bias, ws, heads, kd, dv))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
        # the guard has teeth: the max-free form really does break here
        bad = np.asarray(self._run("maxfree", qkv, bias, ws, heads, kd, dv))
        assert (not np.isfinite(bad).all()
                or np.abs(bad - want).max() > 1e-2)

    @pytest.mark.parametrize("layout", ["head_major", "qkv_major"])
    @pytest.mark.parametrize("shift", [+90.0, -120.0])
    def test_pv_fold_exact_at_extreme_logit_scales(self, layout, shift):
        # The round-5 PV-fold-norm forward (exp-only VPU softmax, rowsum as
        # a stacked MXU dot-with-ones, divide deferred to the output tile)
        # keeps the exact per-row max-subtract, so it must be exact at the
        # same extreme logit scales as the shipped default. It is the AUTO
        # default for qkv_major (Swin/S3); force it on for head_major too.
        import cream_tpu.ops.pallas.window_attention as wa
        rng = np.random.default_rng(13)
        B, H, W, ws, heads, kd, dv = 1, 14, 14, 7, 3, 32, 32
        L = heads * (2 * kd + dv)
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws))
                           + shift, jnp.float32)
        want = np.asarray(ref_window_attention(qkv, bias, ws, heads, kd, dv,
                                               layout=layout))
        old = wa.PV_FOLD_NORM
        wa.PV_FOLD_NORM = True
        try:
            jax.clear_caches()
            got = np.asarray(fused_window_attention(
                qkv, bias, window=ws, heads=heads, kd=kd, dv=dv,
                layout=layout, interpret=True))
        finally:
            wa.PV_FOLD_NORM = old
            jax.clear_caches()
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_safe_grads_finite_at_large_scale(self):
        rng = np.random.default_rng(12)
        B, H, W, ws, heads, kd, dv = 1, 14, 14, 7, 2, 16, 16
        L = heads * (2 * kd + dv)
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws))
                           + 90.0, jnp.float32)
        import cream_tpu.ops.pallas.window_attention as wa
        old = wa.MXU_SOFTMAX
        wa.MXU_SOFTMAX = "safe"
        try:
            jax.clear_caches()

            def loss(qkv, bias):
                o = fused_window_attention(qkv, bias, window=ws, heads=heads,
                                           kd=kd, dv=dv, interpret=True)
                return jnp.sum(o * o)

            def loss_ref(qkv, bias):
                o = ref_window_attention(qkv, bias, ws, heads, kd, dv)
                return jnp.sum(o * o)

            gq, gb = jax.grad(loss, argnums=(0, 1))(qkv, bias)
            rq, rb = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
            np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                                       atol=2e-4, rtol=1e-3)
            np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                       atol=2e-4, rtol=1e-3)
        finally:
            wa.MXU_SOFTMAX = old
            jax.clear_caches()


class TestFusedMBConv:
    def _vars(self, m, x, rng):
        import jax.tree_util as jtu

        v = m.init(jax.random.key(0), x)

        def riffle(path, a):
            name = "/".join(str(p) for p in path)
            if "kernel" in name:
                return jnp.asarray(rng.standard_normal(a.shape) * 0.1,
                                   jnp.float32)
            if "scale" in name:
                return jnp.asarray(rng.uniform(0.8, 1.2, a.shape), jnp.float32)
            if "var" in name:
                return jnp.asarray(rng.uniform(0.5, 1.5, a.shape), jnp.float32)
            return jnp.asarray(rng.standard_normal(a.shape) * 0.1, jnp.float32)

        return {"params": jtu.tree_map_with_path(riffle, v["params"]),
                "batch_stats": jtu.tree_map_with_path(riffle,
                                                      v["batch_stats"])}

    def test_matches_module_fp32_and_bf16(self):
        from cream_tpu.nn.layers import MBConv
        from cream_tpu.ops.pallas.mbconv import (fold_mbconv_variables,
                                                 fused_mbconv)
        rng = np.random.default_rng(0)
        H = W = 8
        C = 32
        m = MBConv(C, 4.0, use_pallas=False)
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        v = self._vars(m, x, rng)
        ref = m.apply(v, x)
        got = fused_mbconv(x, *fold_mbconv_variables(v, jnp.float32),
                           interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

        mb = MBConv(C, 4.0, use_pallas=False, dtype=jnp.bfloat16)
        xb = x.astype(jnp.bfloat16)
        refb = np.asarray(mb.apply(v, xb).astype(jnp.float32))
        gotb = np.asarray(fused_mbconv(
            xb, *fold_mbconv_variables(v, jnp.bfloat16),
            interpret=True).astype(jnp.float32))
        np.testing.assert_allclose(gotb, refb, atol=0.05, rtol=0.05)

    def test_supports_shape_gate(self):
        from cream_tpu.ops.pallas.mbconv import supports_shape
        assert supports_shape(56, 56, 96, 4.0, jnp.bfloat16)
        assert not supports_shape(112, 112, 96, 4.0, jnp.float32)  # VMEM
        assert not supports_shape(56, 56, 100, 4.0, jnp.bfloat16)  # lanes


class TestFusedCGA:
    def test_matches_module(self):
        """Fused CGA (interpret) vs the module, incl. mixed per-head dw
        kernel sizes and the non-square-padding ws=4 stage-2 shape."""
        import jax.tree_util as jtu
        from cream_tpu.models.efficientvit import (CascadedGroupAttention,
                                                   attention_bias_indices)
        from cream_tpu.ops.pallas.cga import fold_cga_variables, fused_cga

        rng = np.random.default_rng(0)
        for ws, C, h, kd, ar, kernels in ((7, 64, 4, 16, 1.0, (5, 3, 5, 3)),
                                          (4, 192, 4, 16, 3.0, (5, 5, 5, 5))):
            d = int(ar * kd)
            m = CascadedGroupAttention(C, kd, h, ar, ws, kernels,
                                       use_pallas=False)
            x = jnp.asarray(rng.standard_normal((6, ws, ws, C)), jnp.float32)
            v = m.init(jax.random.key(0), x)

            def riffle(path, a):
                name = "/".join(str(p) for p in path)
                if "kernel" in name:
                    return jnp.asarray(rng.standard_normal(a.shape) * 0.1,
                                       jnp.float32)
                if "scale" in name:
                    return jnp.asarray(rng.uniform(0.8, 1.2, a.shape),
                                       jnp.float32)
                if "var" in name:
                    return jnp.asarray(rng.uniform(0.5, 1.5, a.shape),
                                       jnp.float32)
                return jnp.asarray(rng.standard_normal(a.shape) * 0.1,
                                   jnp.float32)

            v = {"params": jtu.tree_map_with_path(riffle, v["params"]),
                 "batch_stats": jtu.tree_map_with_path(riffle,
                                                       v["batch_stats"])}
            ref = m.apply(v, x)
            idxs, _ = attention_bias_indices((ws, ws))
            ks_max = max(kernels[:h])
            ops = fold_cga_variables(v, h, kd, d, ks_max, jnp.float32)
            got = fused_cga(x, v["params"]["attention_biases"], idxs, *ops,
                            ws=ws, heads=h, c_in=C // h, kd=kd, d=d,
                            ks_max=ks_max, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4)


class TestQKVBiasFold:
    """qkv_bias folded in-kernel == bias added to the qkv tensor outside
    (fwd + all grads incl. the bias's own) — the HBM-pass-saving fold used
    by WindowBiasAttention / Swin WindowAttention."""

    def test_fwd_and_grads(self):
        rng = np.random.default_rng(11)
        B, H, W, ws, heads, kd, dv = 2, 14, 14, 7, 3, 16, 32
        L = heads * (2 * kd + dv)
        qkv = jnp.asarray(rng.standard_normal((B, H, W, L)), jnp.float32)
        qb = jnp.asarray(rng.standard_normal((L,)) * 0.5, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * .5,
                           jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((B, H, W, heads * dv)),
                          jnp.float32)

        def loss_fold(qkv, bias, qb):
            o = fused_window_attention(qkv, bias, window=ws, heads=heads,
                                       kd=kd, dv=dv, qkv_bias=qb,
                                       interpret=True)
            return jnp.sum(o * wgt)

        def loss_outside(qkv, bias, qb):
            o = fused_window_attention(qkv + qb, bias, window=ws, heads=heads,
                                       kd=kd, dv=dv, interpret=True)
            return jnp.sum(o * wgt)

        np.testing.assert_allclose(
            np.asarray(loss_fold(qkv, bias, qb)),
            np.asarray(loss_outside(qkv, bias, qb)), rtol=1e-5)
        g1 = jax.grad(loss_fold, argnums=(0, 1, 2))(qkv, bias, qb)
        g2 = jax.grad(loss_outside, argnums=(0, 1, 2))(qkv, bias, qb)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3)


class TestCGACore:
    """cga_core.cga_attention (windows-packed score/softmax/PV GEMM) vs the
    einsum chain it replaces in CascadedGroupAttention."""

    @pytest.mark.parametrize("W,N,kd,d", [(32, 49, 16, 16), (64, 16, 16, 64),
                                          (16, 49, 16, 32)])
    def test_matches_einsum(self, W, N, kd, d):
        from cream_tpu.ops.pallas.cga_core import cga_attention
        ks = jax.random.split(jax.random.key(0), 4)
        q = jax.random.normal(ks[0], (W, N, kd), jnp.float32)
        k = jax.random.normal(ks[1], (W, N, kd), jnp.float32)
        v = jax.random.normal(ks[2], (W, N, d), jnp.float32)
        bias = jax.random.normal(ks[3], (N, N), jnp.float32)
        scale = kd ** -0.5
        attn = jnp.einsum("bnk,bmk->bnm", q, k) * scale + bias[None]
        ref = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(attn, axis=-1), v)
        got = cga_attention(q, k, v, bias, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_block_window_isolation(self):
        """Windows packed into one GEMM must not attend across each other:
        perturbing window 0 leaves every other window's output bit-identical."""
        from cream_tpu.ops.pallas.cga_core import cga_attention
        ks = jax.random.split(jax.random.key(1), 4)
        q = jax.random.normal(ks[0], (32, 49, 16), jnp.float32)
        k = jax.random.normal(ks[1], (32, 49, 16), jnp.float32)
        v = jax.random.normal(ks[2], (32, 49, 16), jnp.float32)
        bias = jax.random.normal(ks[3], (49, 49), jnp.float32)
        a = cga_attention(q, k, v, bias, 0.25, interpret=True)
        b = cga_attention(q.at[0].add(3.0), k.at[0].set(-k[0]),
                          v.at[0].mul(2.0), bias, 0.25, interpret=True)
        assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1:]), np.asarray(b[1:]))

    def test_gate_logic(self):
        from cream_tpu.ops.pallas.cga_core import pick_block_windows, supports
        assert pick_block_windows(4096, 49) == 16   # G*N = 784
        assert pick_block_windows(1024, 16) == 32   # capped by G*N <= 784
        assert supports(1024, 49)
        assert not supports(6, 49)  # 49*2 not a 16-multiple beyond G=...
