"""End-to-end NAS pipeline smokes: supernet-train -> evolution-on-trained-
weights -> subnet extraction (round-1 verdict missing #2), exercising the
actual CLIs the way a user would."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
class TestAutoFormerSearchPipeline:
    def test_train_then_search_then_extract(self, tmp_path):
        from cream_tpu.cli import search_evolution, supernet_train

        out = str(tmp_path)
        common = ["data.dataset=synthetic", "data.batch_size=8",
                  "model.dtype=float32",
                  "data.img_size=32", "model.num_classes=7",
                  f"output={out}"]
        ckpt_dir = supernet_train.main(
            ["--space", "tiny", "train.epochs=1", "train.warmup_epochs=0",
             "train.ema_decay=0.99"] + common)
        assert os.path.isdir(ckpt_dir)

        # refuses a random-init search
        with pytest.raises(SystemExit):
            search_evolution.main(["--space", "tiny"] + common)

        result = str(tmp_path / "evo.json")
        top = search_evolution.main(
            ["--space", "tiny", "--ckpt", ckpt_dir, "--epochs", "2",
             "--population", "4", "--max-eval-batches", "2",
             "--out", result] + common)
        assert len(top) >= 1
        best_cfg = top[0][1]
        assert os.path.exists(result)
        state = json.load(open(result))
        assert state["top"]

        # deploy leg: extract the winning subnet and run it
        from cream_tpu.core.checkpoint import restore_params
        from cream_tpu.models import create_model
        from cream_tpu.models.autoformer import (
            SPACES, encode_config, extract_subnet, sample_config)
        space = SPACES["tiny"]
        model = create_model("autoformer_supernet_tiny", num_classes=7)
        x0 = jnp.zeros((2, 32, 32, 3))
        c0 = encode_config(sample_config(np.random.default_rng(0), space),
                           space)
        shapes = jax.eval_shape(model.init, jax.random.key(0), x0, c0)
        variables = {"params": restore_params(ckpt_dir, shapes["params"])}
        sub, sub_vars = extract_subnet(variables, best_cfg, space,
                                       num_classes=7)
        y = jax.jit(lambda v, x: sub.apply(v, x))(sub_vars, x0)
        assert y.shape == (2, 7)
        # extracted subnet must agree with the masked supernet on the config
        y_super = jax.jit(lambda v, x, c: model.apply(v, x, c))(
            variables, x0, encode_config(best_cfg, space))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_super)[:, :7],
                                   atol=2e-5)


@pytest.mark.slow
class TestSupernetTrainFeatures:
    def test_teacher_kd_and_resume(self, tmp_path, capsys):
        from cream_tpu.cli import supernet_train

        out = str(tmp_path)
        common = ["data.dataset=synthetic", "data.batch_size=8",
                  "model.dtype=float32",
                  "data.img_size=32", "model.num_classes=7",
                  "train.warmup_epochs=0", f"output={out}"]
        # epoch 0 with a (random) teacher KD path exercised
        supernet_train.main(
            ["--space", "tiny", "train.epochs=1", "distill.kind=hard",
             "distill.teacher=efficientvit_m0"] + common)
        # re-invoke with more epochs: must auto-resume from epoch 1
        supernet_train.main(
            ["--space", "tiny", "train.epochs=2", "distill.kind=none"]
            + common)
        assert "auto-resumed" in capsys.readouterr().out


class TestBatchedCandidateEval:
    def test_vmap_batch_eval_matches_serial(self):
        """k-candidate vmapped eval == k serial evals (the configs are
        traced data, so one compiled program scores a stacked batch)."""
        import jax.tree_util as jtu
        from cream_tpu.models import create_model
        from cream_tpu.models.autoformer import (SPACES, encode_config,
                                                 sample_config)
        space = SPACES["tiny"]
        model = create_model("autoformer_supernet_tiny", num_classes=7)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 7, (4,)), jnp.int32)
        c0 = encode_config(sample_config(rng, space), space)
        variables = jax.jit(model.init)(jax.random.key(0), x, c0)

        configs = [sample_config(rng, space) for _ in range(5)]
        encs = [encode_config(c, space) for c in configs]

        def acc(enc):
            logits = model.apply(variables, x, enc)
            return ((logits.argmax(-1) == y).sum(), y.shape[0])

        serial = [jax.jit(acc)(e)[0] for e in encs]
        stacked = jtu.tree_map(lambda *xs: jnp.stack(xs), *encs)
        batched = jax.jit(jax.vmap(acc))(stacked)[0]
        np.testing.assert_array_equal(np.asarray(batched),
                                      np.asarray(jnp.stack(serial)))

    def test_searcher_batch_path_matches_serial_path(self):
        from cream_tpu.nas.evolution import EvolutionSearcher

        def fitness(cfg):
            return cfg["v"] * 0.1

        def sample(rng):
            return {"v": int(rng.integers(0, 1000))}

        def mutate(rng, c):
            return {"v": int((c["v"] + rng.integers(1, 10)) % 1000)}

        def cross(rng, a, b):
            return {"v": (a["v"] + b["v"]) // 2}

        kw = dict(sample_fn=sample, mutate_fn=mutate, crossover_fn=cross,
                  population_num=12, select_num=4, mutation_num=6,
                  crossover_num=6, max_epochs=3, seed=7)
        serial = EvolutionSearcher(eval_fn=fitness, **kw)
        batched = EvolutionSearcher(
            eval_fn=fitness,
            batch_eval_fn=lambda cfgs: [fitness(c) for c in cfgs], **kw)
        top_s = serial.search(log=lambda *a: None)
        top_b = batched.search(log=lambda *a: None)
        assert [s for s, _ in top_s] == [s for s, _ in top_b]
        assert [c for _, c in top_s] == [c for _, c in top_b]
