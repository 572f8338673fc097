"""Cream supernet + prioritized board + meta matching; Mini-DeiT multiplexing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cream_tpu.models import create_model
from cream_tpu.models.cream import CreamSupernet, MetaMatchingHead, CHOICES
from cream_tpu.nas.cream import (
    PrioritizedBoard, make_cream_train_step, make_meta_update_step,
    sample_architecture, soft_kd_loss)
from cream_tpu.nas.flops import arch_flops, build_flops_table
from cream_tpu.train import TrainState

from helpers import jit_init, n_params


LAYERS = [d for _, d, _ in CreamSupernet().stages]


class TestCreamSupernet:
    def test_single_compile_over_paths(self):
        model = CreamSupernet(num_classes=5)
        x = jnp.ones((1, 64, 64, 3))
        rng = np.random.default_rng(0)
        a0 = jnp.asarray(sample_architecture(rng, LAYERS))
        v = jit_init(model, x, a0)
        f = jax.jit(lambda v, x, a: model.apply(v, x, a))
        for _ in range(3):
            f(v, x, jnp.asarray(sample_architecture(rng, LAYERS)))
        assert f._cache_size() == 1

    def test_skip_layers_are_identity(self):
        model = CreamSupernet(num_classes=5)
        x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
        arch = np.zeros(20, np.int32)
        v = jit_init(model, x, jnp.asarray(arch))
        y_full = model.apply(v, x, jnp.asarray(arch))
        arch_skip = arch.copy()
        arch_skip[1:4] = -1      # skip non-first layers of stage 0
        y_skip = model.apply(v, x, jnp.asarray(arch_skip))
        assert not np.allclose(np.asarray(y_full), np.asarray(y_skip))

    def test_flops_table(self):
        table = build_flops_table()
        assert table.shape == (20, 6)
        # k7 e6 strictly more expensive than k3 e4 everywhere
        assert (table[:, 5] > table[:, 0]).all()
        rng = np.random.default_rng(0)
        arch = sample_architecture(rng, LAYERS)
        f = arch_flops(arch, table)
        # mobile regime: between 50M and 1.5G MACs
        assert 5e7 < f < 1.5e9
        arch_skip = arch.copy()
        arch_skip[1] = -1
        assert arch_flops(arch_skip, table) < f


class TestChildNet:
    def test_extraction_parity(self):
        from cream_tpu.models.cream import extract_childnet
        model = CreamSupernet(num_classes=7, stages=((24, 2, 2), (40, 2, 2)))
        arch = np.array([0, -1, 3, 5], np.int32)
        x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
        v = jit_init(model, x, jnp.asarray(arch))
        want = model.apply(v, x, jnp.asarray(arch))
        child, cv = extract_childnet(v, arch, num_classes=7,
                                     stages=((24, 2, 2), (40, 2, 2)))
        got = child.apply(cv, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
        assert n_params(cv["params"]) < n_params(v["params"])


class TestPrioritizedBoard:
    def test_update_rules(self):
        b = PrioritizedBoard(pool_size=2, acc_gap=5.0, meta_sta_epoch=1)
        assert not b.update(epoch=0, prec1=50, flops=100, arch=[0], inputs=None,
                            logits=None)  # before meta_sta_epoch
        assert b.update(2, 50, 100, [0], None, None)
        assert b.update(2, 60, 100, [1], None, None)
        # full board: needs acc_gap or better acc at lower flops
        assert not b.update(2, 51, 200, [2], None, None)
        assert b.update(2, 56, 100, [3], None, None)   # > 50 + gap
        assert len(b) == 2 and b.board[0].prec1 == 60

    def test_op_probability(self):
        b = PrioritizedBoard(pool_size=4, meta_sta_epoch=0)
        b.update(1, 50, 1, np.array([0, 0, 1]), None, None)
        p = b.op_probability()
        assert p is not None and p[0] == pytest.approx(2 / 3)

    def test_sampling_with_prob(self):
        rng = np.random.default_rng(0)
        prob = np.zeros(6)
        prob[2] = 1.0
        arch = sample_architecture(rng, LAYERS, prob=prob)
        assert (arch == 2).all() and len(arch) == 20


@pytest.mark.slow
class TestCreamTraining:
    def test_kd_train_step_and_meta_update(self):
        model = CreamSupernet(num_classes=4, stages=((24, 2, 2), (40, 2, 2)))
        meta = MetaMatchingHead(hidden=16)
        x = jax.random.normal(jax.random.key(0), (8, 32, 32, 3))
        y = jnp.arange(8) % 4
        rng = np.random.default_rng(0)
        layers = [2, 2]
        a_s = jnp.asarray(sample_architecture(rng, layers))
        a_t = jnp.asarray(sample_architecture(rng, layers))
        v = jit_init(model, x, a_s)
        mv = jax.jit(meta.init)(jax.random.key(1),
                                jnp.zeros((4, 4)))
        tx = optax.sgd(0.05)
        state = TrainState.create(params=v["params"], tx=tx,
                                  batch_stats=v["batch_stats"])
        step = make_cream_train_step(model, tx)
        losses = []
        for i in range(6):
            state, m = step(state, {"image": x, "label": y}, a_s, a_t,
                            jnp.float32(0.5), jnp.bool_(True))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

        # 2nd-order meta step produces finite grads for the meta head
        meta_step = make_meta_update_step(model, meta, sgd_lr=0.05,
                                          slice_size=4)
        kd_logits = jax.nn.softmax(
            jax.random.normal(jax.random.key(2), (4, 4)), -1)
        loss, g = meta_step(mv, state.variables, x, y, a_s, a_t, kd_logits)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)

    def test_select_teacher_top1(self):
        b = PrioritizedBoard(pool_size=2, meta_sta_epoch=0)
        b.update(1, 50, 1, np.array([0]), None, None)
        b.update(1, 70, 1, np.array([1]), None, None)
        mv, arch = b.select_teacher(None, None, None)
        assert mv == 0.5 and arch.tolist() == [1]


class TestMiniDeiT:
    @pytest.mark.parametrize("name,expect_m", [
        ("mini_deit_tiny_patch16_224", 3.0), ("mini_deit_small_patch16_224", 11.0),
    ])
    def test_param_counts(self, name, expect_m):
        # Mini-DeiT-Ti 3M, -S 11M (MiniViT/README.md:31-32)
        model = create_model(name)
        v = jax.eval_shape(lambda: model.init(jax.random.key(0),
                                              jnp.zeros((1, 224, 224, 3))))
        m = n_params(v["params"]) / 1e6
        assert abs(m - expect_m) / expect_m < 0.12, f"{name}: {m:.2f}M"

    def test_forward(self):
        model = create_model("mini_deit_tiny_patch16_224", num_classes=10)
        x = jax.random.normal(jax.random.key(0), (2, 224, 224, 3))
        v = jit_init(model, x)
        out = jax.jit(lambda v, x: model.apply(v, x))(v, x)
        assert out.shape == (2, 10) and bool(jnp.isfinite(out).all())
        # 12 layers shared 2x -> 6 physical blocks with per-repeat extras
        p = v["params"]
        assert "blocks_5" in p and "blocks_6" not in p
        blk = p["blocks_0"]
        assert "rpe_k_0" in blk and "rpe_k_1" in blk and "qkv" in blk
        assert "conv_l_0" in blk and "conv_w_1" in blk
