"""TPU-only guards for the fused-kernel TRAINING path.

The CI suite runs on CPU where the Pallas kernels are gated off; these
tests only run on a real TPU (python -m pytest tests/test_tpu_train_path.py
without the conftest CPU forcing is not needed — they self-skip) and assert
that the custom_vjp window-attention kernel used in training produces the
same gradients as the einsum fallback.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tpu():
    try:
        return jax.devices()[0].platform.lower() == "tpu" or \
            "TPU" in str(jax.devices()[0])
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu(), reason="needs a real TPU")


class TestTrainPathGrads:
    def test_window_attention_train_grads_match_fallback(self):
        from cream_tpu.nn.attention import WindowBiasAttention

        def build(use_pallas):
            return WindowBiasAttention(dim=64, key_dim=16, num_heads=4,
                                       window=7, use_pallas=use_pallas)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 14, 14, 64)), jnp.float32)
        m_k, m_e = build(True), build(False)
        v = m_k.init(jax.random.key(0), x, train=True)

        def loss(m):
            def f(params, xx):
                y = m.apply({"params": params}, xx, train=True)
                return jnp.sum(y * y)
            return f

        lk, gk = jax.jit(jax.value_and_grad(loss(m_k)))(v["params"], x)
        le, ge = jax.jit(jax.value_and_grad(loss(m_e)))(v["params"], x)
        np.testing.assert_allclose(float(lk), float(le), rtol=1e-4)

        def check(path, a, b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-3,
                err_msg=jax.tree_util.keystr(path))

        jax.tree_util.tree_map_with_path(check, gk, ge)
