import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cream_tpu.models import create_model, list_models

from helpers import jit_init, n_params


class TestEfficientViT:
    def test_registry(self):
        names = list_models("efficientvit")
        assert len(names) == 6

    @pytest.mark.parametrize("name,expect_m", [
        ("efficientvit_m0", 2.3), ("efficientvit_m4", 8.8), ("efficientvit_m5", 12.4),
    ])
    def test_param_count(self, name, expect_m):
        # published sizes: M0 2.3M, M4 8.8M, M5 12.4M
        # (EfficientViT/classification/README.md:9-14)
        model = create_model(name)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3))))
        m = n_params(variables["params"]) / 1e6
        assert abs(m - expect_m) / expect_m < 0.06, f"{name}: {m:.2f}M params"

    def test_forward_shape_full_res(self):
        model = create_model("efficientvit_m0", num_classes=1000)
        x = jax.random.normal(jax.random.key(0), (2, 224, 224, 3))
        variables = jit_init(model, x)
        logits = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        assert logits.shape == (2, 1000)
        assert bool(jnp.isfinite(logits).all())

    def test_stage_resolutions(self):
        # 224/16 = 14 -> 7 -> 4 (ceil division through stride-2 convs)
        model = create_model("efficientvit_m0", num_classes=0)
        x = jnp.zeros((1, 224, 224, 3))
        variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
        feats = jax.eval_shape(
            lambda v: model.apply(v, x, method="forward_features"), variables)
        assert feats.shape == (1, 4, 4, 192)

    def test_distillation_head(self):
        model = create_model("efficientvit_m0", num_classes=10, distillation=True)
        x = jax.random.normal(jax.random.key(0), (2, 96, 96, 3))
        variables = jit_init(model, x)
        # eval: averaged heads -> single tensor
        out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        assert out.shape == (2, 10)

        @jax.jit
        def train_apply(v, x):
            return model.apply(v, x, train=True, mutable=["batch_stats"])
        (main, dist), _ = train_apply(variables, x)
        assert main.shape == (2, 10) and dist.shape == (2, 10)

    def test_train_batchnorm_updates(self):
        model = create_model("efficientvit_m1", num_classes=10)
        x = jax.random.normal(jax.random.key(0), (2, 96, 96, 3))
        variables = jit_init(model, x)

        @jax.jit
        def train_apply(v, x):
            return model.apply(v, x, train=True, mutable=["batch_stats"])
        out, mutated = train_apply(variables, x)
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))
