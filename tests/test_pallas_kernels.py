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
