import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cream_tpu.train import TrainState
from cream_tpu.train.optim import (
    weight_decay_mask, make_adamw, cosine_schedule, layer_lr_scales,
    scale_by_layer_lr)
from cream_tpu.train.losses import (
    label_smoothing_ce, soft_target_ce, dense_from_topk,
    deit_distillation_loss, kl_divergence, hidden_relation_loss,
    relation_distillation_loss, interactive_loss)
from cream_tpu.data.mixup import mixup_cutmix
from cream_tpu.train.metrics import AverageMeter, topk_accuracy_counts
from cream_tpu.core.config import Config


class TestOptim:
    def test_weight_decay_mask(self):
        params = {
            "block": {"conv": {"kernel": jnp.zeros((3, 3, 4, 8))},
                      "bn": {"scale": jnp.zeros(8), "bias": jnp.zeros(8)}},
            "attn": {"attention_biases": jnp.zeros((4, 49)),
                     "qkv": {"kernel": jnp.zeros((8, 24)), "bias": jnp.zeros(24)}},
        }
        mask = weight_decay_mask(params)
        assert mask["block"]["conv"]["kernel"] is True
        assert mask["block"]["bn"]["scale"] is False
        assert mask["attn"]["attention_biases"] is False
        assert mask["attn"]["qkv"]["kernel"] is True
        assert mask["attn"]["qkv"]["bias"] is False

    def test_cosine_schedule_endpoints(self):
        s = cosine_schedule(1e-3, warmup_steps=10, total_steps=100,
                            warmup_init_lr=1e-7, min_lr=1e-6)
        assert float(s(0)) == pytest.approx(1e-7, rel=1e-3)
        assert float(s(10)) == pytest.approx(1e-3, rel=1e-3)
        assert float(s(100)) == pytest.approx(1e-6, rel=1e-2)

    def test_layer_lr_scaling(self):
        params = {"stages_0_0": {"k": jnp.ones(3)}, "head": {"k": jnp.ones(3)}}

        def block_of(path):
            return 0 if "stages_0_0" in path else None
        scales = layer_lr_scales(params, depth=3, block_of=block_of,
                                 decay_rate=0.5)
        assert float(jax.tree_util.tree_leaves(scales)[1]) == 0.25  # stages
        tx = scale_by_layer_lr(scales)
        upd, _ = tx.update({"stages_0_0": {"k": jnp.ones(3)},
                            "head": {"k": jnp.ones(3)}}, tx.init(params))
        np.testing.assert_allclose(upd["stages_0_0"]["k"], 0.25)
        np.testing.assert_allclose(upd["head"]["k"], 1.0)

    def test_adamw_trains(self):
        params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros(4)}
        tx = make_adamw(1e-2, params=params)
        state = TrainState.create(params=params, tx=tx)

        def loss(p):
            return jnp.sum(p["w"] ** 2) + jnp.sum(p["bias"] ** 2)
        for _ in range(3):
            g = jax.grad(loss)(state.params)
            state = state.apply_gradients(g)
        assert float(loss(state.params)) < float(loss(params))
        assert int(state.step) == 3


class TestLosses:
    def test_soft_target_equals_hard_ce_for_onehot(self):
        logits = jax.random.normal(jax.random.key(0), (4, 10))
        labels = jnp.array([1, 2, 3, 4])
        hard = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        soft = soft_target_ce(logits, jax.nn.one_hot(labels, 10))
        assert float(jnp.abs(hard - soft)) < 1e-6

    def test_dense_from_topk(self):
        values = jnp.array([[0.5, 0.3], [0.6, 0.2]])
        indices = jnp.array([[1, 3], [0, 2]])
        dense = dense_from_topk(values, indices, num_classes=5)
        np.testing.assert_allclose(dense.sum(-1), 1.0, atol=1e-6)
        assert float(dense[0, 1]) == pytest.approx(0.5)
        assert float(dense[0, 3]) == pytest.approx(0.3)
        # remaining mass split over 3 classes
        assert float(dense[0, 0]) == pytest.approx(0.2 / 3)

    def test_kl_zero_for_identical(self):
        logits = jax.random.normal(jax.random.key(0), (4, 10))
        assert float(kl_divergence(logits, logits, tau=2.0)) < 1e-6

    def test_deit_distillation_modes(self):
        s = jax.random.normal(jax.random.key(0), (4, 10))
        t = jax.random.normal(jax.random.key(1), (4, 10))
        base = jnp.float32(2.0)
        none = deit_distillation_loss(base, s, t, kind="none")
        assert float(none) == 2.0
        soft = deit_distillation_loss(base, s, t, kind="soft", alpha=0.5, tau=2.0)
        hard = deit_distillation_loss(base, s, t, kind="hard", alpha=0.5)
        assert float(soft) != float(hard)
        # alpha=1 ignores base loss
        only = deit_distillation_loss(base, s, s, kind="soft", alpha=1.0)
        assert float(only) < 1e-6

    def test_relation_losses_zero_for_identical(self):
        qkv = jax.random.normal(jax.random.key(0), (3, 2, 4, 9, 8))
        assert float(relation_distillation_loss(qkv, qkv, 2)) > 0  # CE != 0
        h = jax.random.normal(jax.random.key(1), (2, 9, 8))
        assert float(hidden_relation_loss(h, h)) < 1e-10

    def test_interactive_loss_kinds(self):
        a = jax.random.normal(jax.random.key(0), (4, 10))
        b = jax.random.normal(jax.random.key(1), (4, 10))
        for kind in ("kl", "mse", "cos"):
            v = interactive_loss(a, b, kind=kind)
            assert np.isfinite(float(v))

    def test_label_smoothing(self):
        logits = jnp.zeros((2, 4))
        labels = jnp.array([0, 1])
        v = label_smoothing_ce(logits, labels, 0.1)
        assert float(v) == pytest.approx(np.log(4), rel=1e-5)


class TestMixup:
    def test_shapes_and_target_mass(self):
        rng = jax.random.key(0)
        x = jax.random.normal(jax.random.key(1), (8, 32, 32, 3))
        y = jnp.arange(8) % 4
        mx, my = mixup_cutmix(rng, x, y, num_classes=4, smoothing=0.1)
        assert mx.shape == x.shape and my.shape == (8, 4)
        np.testing.assert_allclose(my.sum(-1), 1.0, atol=1e-5)

    def test_deterministic_in_key(self):
        x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
        y = jnp.arange(4)
        a = mixup_cutmix(jax.random.key(7), x, y, 10)
        b = mixup_cutmix(jax.random.key(7), x, y, 10)
        np.testing.assert_array_equal(a[0], b[0])


class TestConfig:
    def test_yaml_merge_and_opts(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text("MODEL:\n  NAME: efficientvit_m5\nTRAIN:\n  EPOCHS: 100\n")
        cfg = Config.from_yaml(str(p), opts=["train.base_lr=2e-3",
                                             "model.num_classes=100"])
        assert cfg.model.name == "efficientvit_m5"
        assert cfg.train.epochs == 100
        assert cfg.train.base_lr == 2e-3
        assert cfg.model.num_classes == 100

    def test_unknown_key_raises(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text("MODEL:\n  NO_SUCH_KEY: 1\n")
        with pytest.raises(KeyError):
            Config.from_yaml(str(p))

    def test_base_inheritance(self, tmp_path):
        (tmp_path / "base.yaml").write_text("TRAIN:\n  EPOCHS: 90\n")
        (tmp_path / "child.yaml").write_text(
            "BASE: base.yaml\nTRAIN:\n  BASE_LR: 0.01\n")
        cfg = Config.from_yaml(str(tmp_path / "child.yaml"))
        assert cfg.train.epochs == 90 and cfg.train.base_lr == 0.01


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from cream_tpu.core.checkpoint import (
            save_checkpoint, restore_checkpoint, latest_step)
        params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
        tx = optax.adam(1e-3)
        state = TrainState.create(params=params, tx=tx)
        save_checkpoint(str(tmp_path / "ckpt"), 5, state,
                        extra={"max_accuracy": 81.5})
        assert latest_step(str(tmp_path / "ckpt")) == 5
        abstract = jax.eval_shape(lambda: state)
        restored, extra, step = restore_checkpoint(str(tmp_path / "ckpt"),
                                                   abstract)
        assert step == 5
        np.testing.assert_array_equal(restored.params["w"], params["w"])


    def test_async_checkpointer(self, tmp_path):
        from cream_tpu.core.checkpoint import (
            AsyncCheckpointer, latest_step, restore_checkpoint)
        params = {"w": jnp.arange(4, dtype=jnp.float32)}
        state = TrainState.create(params=params, tx=optax.adam(1e-3))
        with AsyncCheckpointer(str(tmp_path / "ck"), max_to_keep=2) as ck:
            for step in (1, 2, 3):  # overlapping saves serialize in orbax
                ck.save(step, state, extra={"epoch": step})
        assert latest_step(str(tmp_path / "ck")) == 3
        restored, extra, step = restore_checkpoint(
            str(tmp_path / "ck"), jax.eval_shape(lambda: state))
        assert step == 3 and extra["epoch"] == 3
        np.testing.assert_array_equal(restored.params["w"], params["w"])


class TestMetrics:
    def test_average_meter(self):
        m = AverageMeter(window=2)
        for v in (1.0, 2.0, 3.0):
            m.update(v)
        assert m.avg == 2.0 and m.smoothed == 2.5

    def test_topk_counts(self):
        out = topk_accuracy_counts([
            {"correct1": 5, "correct5": 9, "n": 10, "loss_sum": 10.0},
            {"correct1": 7, "correct5": 10, "n": 10, "loss_sum": 8.0},
        ])
        assert out["acc1"] == 60.0 and out["acc5"] == 95.0 and out["n"] == 20


@pytest.mark.slow
class TestGraftEntry:
    def test_dryrun_multichip_inprocess(self):
        """The driver's multi-chip signal: with >=8 devices available (conftest
        provisions 8 virtual CPU devices) the body runs in-process."""
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)


class TestSeededPairMixup:
    """The reference's pair2 mixup (TinyViT mixup.py:213-235): deterministic
    in the per-sample aug seeds so save_logits and the distill loop agree."""

    def _batch(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((8, 16, 16, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 10, 8), jnp.int32)
        seeds = jnp.asarray(rng.integers(0, 2**31, 8), jnp.int32)
        return x, y, seeds

    def test_deterministic_in_seeds(self):
        from cream_tpu.data.mixup import seeded_pair_mixup
        x, y, seeds = self._batch()
        a_img, a_tgt = jax.jit(seeded_pair_mixup, static_argnums=3)(
            seeds, x, y, 10)
        b_img, b_tgt = jax.jit(seeded_pair_mixup, static_argnums=3)(
            seeds, x, y, 10)
        np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
        np.testing.assert_array_equal(np.asarray(a_tgt), np.asarray(b_tgt))
        # different seeds -> different mix
        c_img, _ = jax.jit(seeded_pair_mixup, static_argnums=3)(
            seeds + 1, x, y, 10)
        assert np.abs(np.asarray(a_img) - np.asarray(c_img)).max() > 1e-6

    def test_pairs_mixed_within_pair(self):
        """Mass only moves between samples 2i and 2i+1 (pair2 semantics)."""
        from cream_tpu.data.mixup import seeded_pair_mixup
        x, y, seeds = self._batch()
        y = jnp.arange(8, dtype=jnp.int32)          # distinct labels
        _, tgt = seeded_pair_mixup(seeds, x, y, 8, smoothing=0.0)
        tgt = np.asarray(tgt)
        for i in range(0, 8, 2):
            # all probability mass on classes {i, i+1}
            assert tgt[i, [i, i + 1]].sum() == pytest.approx(1.0, abs=1e-5)
            assert tgt[i + 1, [i, i + 1]].sum() == pytest.approx(1.0, abs=1e-5)
            off = np.delete(tgt[i], [i, i + 1])
            assert np.abs(off).max() < 1e-6

    def test_single_mode_always_applies(self):
        """With cutmix disabled, every batch gets real mixup (no lam=1 holes
        from the disabled branch) — ADVICE r1 fix."""
        from cream_tpu.data.mixup import mixup_cutmix
        x = jnp.ones((4, 8, 8, 3))
        y = jnp.arange(4, dtype=jnp.int32)    # distinct labels expose lam
        lams = []
        for s in range(20):
            _, tgt = mixup_cutmix(jax.random.key(s), x, y, 4,
                                  mixup_alpha=0.8, cutmix_alpha=0.0,
                                  smoothing=0.0)
            lams.append(float(np.asarray(tgt)[0, 0]))
        # beta(0.8, 0.8) should essentially never hit exactly 1.0 twenty
        # times; degenerate switch branches produced lam=1 half the time
        assert sum(1 for v in lams if v > 0.999) < 10


class TestMXUBatchNorm:
    """ops/bn.py bn_train_norm + MXUBatchNorm vs flax nn.BatchNorm:
    forward, all grads, and running-stat updates must match."""

    def test_matches_flax_batchnorm(self):
        import flax.linen as nn

        from cream_tpu.nn.layers import MXUBatchNorm

        x = jax.random.normal(jax.random.key(0), (4, 6, 6, 16), jnp.float32) * 2 + 1
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
        got = MXUBatchNorm()
        vr = ref.init(jax.random.key(1), x)
        vg = got.init(jax.random.key(1), x)
        assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vg)

        def run(mod, v, x):
            y, mut = mod.apply(v, x, mutable=["batch_stats"])
            return y, mut

        yr, mr = run(ref, vr, x)
        yg, mg = run(got, vg, x)
        np.testing.assert_allclose(np.asarray(yg), np.asarray(yr),
                                   atol=1e-5, rtol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mg["batch_stats"][k]),
                np.asarray(mr["batch_stats"][k]), atol=1e-5, rtol=1e-5)

        wgt = jax.random.normal(jax.random.key(2), yr.shape)

        def loss(mod):
            def f(v, x):
                y, _ = mod.apply(v, x, mutable=["batch_stats"])
                return jnp.sum(y * wgt)
            return f

        gr = jax.grad(loss(ref), argnums=(0, 1))(vr, x)
        gg = jax.grad(loss(got), argnums=(0, 1))(vg, x)
        np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gr[1]),
                                   atol=1e-4, rtol=1e-4)  # dx incl. stats paths
        for k in ("scale", "bias"):
            np.testing.assert_allclose(
                np.asarray(gg[0]["params"][k]),
                np.asarray(gr[0]["params"][k]), atol=1e-4, rtol=1e-4)

    def test_convbn_flag_roundtrip(self):
        """ConvBN with the MXU-BN flag on: same params tree, train forward
        matches the flax-BN ConvBN."""
        from cream_tpu.nn.layers import ConvBN
        from cream_tpu.ops import bn as bn_ops

        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8))
        mod = ConvBN(16, kernel_size=3, padding=1)
        old = bn_ops.DEFAULT_MXU_BN
        try:
            bn_ops.DEFAULT_MXU_BN = False
            v = jax.jit(mod.init, static_argnames=("train",))(
                jax.random.key(1), x, train=True)
            a, ma = mod.apply(v, x, train=True, mutable=["batch_stats"])
            bn_ops.DEFAULT_MXU_BN = True
            v2 = jax.jit(mod.init, static_argnames=("train",))(
                jax.random.key(1), x, train=True)
            assert jax.tree_util.tree_structure(v) == \
                jax.tree_util.tree_structure(v2)
            b, mb = mod.apply(v, x, train=True, mutable=["batch_stats"])
        finally:
            bn_ops.DEFAULT_MXU_BN = old
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
        for ka, kb in zip(jax.tree_util.tree_leaves(ma),
                          jax.tree_util.tree_leaves(mb)):
            np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                                       atol=1e-5, rtol=1e-5)
