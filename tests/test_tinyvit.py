import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cream_tpu.models import create_model, list_models

from helpers import jit_init, n_params


class TestTinyViT:
    def test_registry(self):
        names = list_models("tiny_vit")
        assert "tiny_vit_21m_224" in names and "tiny_vit_5m_224" in names

    @pytest.mark.parametrize("name,expect_m", [
        ("tiny_vit_5m_224", 5.4), ("tiny_vit_11m_224", 11.0), ("tiny_vit_21m_224", 21.2),
    ])
    def test_param_count(self, name, expect_m):
        model = create_model(name)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3))))
        m = n_params(variables["params"]) / 1e6
        # within 5% of the published sizes (TinyViT/README.md:53-55)
        assert abs(m - expect_m) / expect_m < 0.05, f"{name}: {m:.2f}M params"

    def test_forward_shape_and_jit(self):
        # 96x96 keeps CPU compile fast; windows adapt via min(ws, H, W)
        model = create_model("tiny_vit_5m_224", num_classes=1000)
        x = jax.random.normal(jax.random.key(0), (2, 96, 96, 3))
        variables = jit_init(model, x)
        logits = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        assert logits.shape == (2, 1000)
        assert bool(jnp.isfinite(logits).all())

    def test_train_mode_batchnorm_updates(self):
        model = create_model("tiny_vit_5m_224", num_classes=10,
                             drop_path_rate=0.1)
        x = jax.random.normal(jax.random.key(0), (2, 96, 96, 3))
        variables = jit_init(model, x)

        @jax.jit
        def train_apply(v, x):
            return model.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"drop_path": jax.random.key(2), "dropout": jax.random.key(3)})

        out, mutated = train_apply(variables, x)
        assert out.shape == (2, 10)
        # batch stats must actually change
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))

    def test_feature_pyramid_shapes(self):
        model = create_model("tiny_vit_5m_224", num_classes=0)
        x = jax.random.normal(jax.random.key(0), (1, 96, 96, 3))
        variables = jit_init(model, x)
        feats = jax.jit(lambda v, x: model.apply(v, x, method="forward_features"))(variables, x)
        # 96 -> /4 patch embed -> /2 per merge x3 => 3x3 final grid, C=320
        assert feats.shape == (1, 3, 3, 320)
