"""AutoFormer supernet: masked-vs-sliced equivalence, single-compile property,
param counting, sampling, evolution search."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models import create_model
from cream_tpu.models.autoformer import (
    SPACES, AutoFormerSubnet, config_param_count, encode_config,
    extract_subnet, sample_config)
from cream_tpu.nas.evolution import (
    EvolutionSearcher, autoformer_crossover, autoformer_mutate)

from helpers import jit_init

# AutoFormer-T retrain genotype (experiments/subnet/AutoFormer-T.yaml RETRAIN)
AUTOFORMER_T = {
    "layer_num": 13,
    "embed_dim": [192] * 13,
    "num_heads": [3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 4, 3, 3],
    "mlp_ratio": [3.5, 3.5, 3.0, 3.5, 3.0, 3.0, 4.0, 4.0, 3.5, 4.0, 3.5, 4.0, 3.5],
}


class TestSampling:
    def test_sample_within_space(self):
        rng = np.random.default_rng(0)
        space = SPACES["tiny"]
        for _ in range(20):
            cfg = sample_config(rng, space)
            assert cfg["layer_num"] in space.depth
            assert all(h in space.num_heads for h in cfg["num_heads"])
            assert all(r in space.mlp_ratio for r in cfg["mlp_ratio"])
            assert cfg["embed_dim"][0] in space.embed_dim
            assert len(cfg["num_heads"]) == cfg["layer_num"]

    def test_param_count_autoformer_t(self):
        # published: AutoFormer-T = 5.8M (AutoFormer/README.md:60)
        n = config_param_count(AUTOFORMER_T)
        assert abs(n / 1e6 - 5.8) < 0.2, n

    def test_flops_autoformer_t(self):
        # AutoFormer-T is published at ~1.3 GMACs
        from cream_tpu.models.autoformer import config_flops
        g = config_flops(AUTOFORMER_T) / 1e9
        assert 1.1 < g < 1.5, g


class TestMaskedVsSliced:
    def test_supernet_matches_extracted_subnet(self):
        """The heart of weight entanglement: a masked supernet forward equals
        the truly-sliced subnet forward, for several sampled configs."""
        space = SPACES["tiny"]
        model = create_model("autoformer_supernet_tiny", num_classes=17,
                             drop_path_rate=0.0)
        x = jax.random.normal(jax.random.key(0), (2, 96, 96, 3))
        cfg0 = sample_config(np.random.default_rng(0), space)
        variables = jit_init(model, x, encode_config(cfg0, space))
        # make params non-trivial (init is fine, but add noise to LN/bias too)
        variables = jax.tree_util.tree_map(
            lambda a: a + 0.01 * jax.random.normal(jax.random.key(2), a.shape),
            variables)

        fwd = jax.jit(lambda v, x, c: model.apply(v, x, c))
        rng = np.random.default_rng(42)
        for trial in range(3):
            cfg = sample_config(rng, space)
            masked = fwd(variables, x, encode_config(cfg, space))
            sub, sub_vars = extract_subnet(variables, cfg, space, num_classes=17)
            sliced = jax.jit(lambda v, x: sub.apply(v, x))(sub_vars, x)
            np.testing.assert_allclose(np.asarray(masked), np.asarray(sliced),
                                       atol=2e-4, rtol=1e-3)

    def test_single_compilation_across_configs(self):
        space = SPACES["tiny"]
        model = create_model("autoformer_supernet_tiny", num_classes=5,
                             drop_path_rate=0.0)
        x = jnp.ones((1, 96, 96, 3))
        cfg = encode_config(sample_config(np.random.default_rng(0), space), space)
        variables = jit_init(model, x, cfg)

        fwd = jax.jit(lambda v, x, c: model.apply(v, x, c))
        rng = np.random.default_rng(1)
        for _ in range(4):
            c = encode_config(sample_config(rng, space), space)
            fwd(variables, x, c)
        assert fwd._cache_size() == 1, "must compile exactly once for all configs"

    def test_depth_masking_identity(self):
        """Layers beyond layer_num must not change the output."""
        space = SPACES["tiny"]
        model = create_model("autoformer_supernet_tiny", num_classes=5,
                             drop_path_rate=0.0)
        x = jax.random.normal(jax.random.key(0), (1, 96, 96, 3))
        cfg = {"layer_num": 12, "embed_dim": [192] * 12,
               "num_heads": [3] * 12, "mlp_ratio": [3.5] * 12}
        variables = jit_init(model, x, encode_config(cfg, space))
        out12 = model.apply(variables, x, encode_config(cfg, space))
        # same config padded as if depth were larger should differ
        cfg14 = {"layer_num": 14, "embed_dim": [192] * 14,
                 "num_heads": [3] * 14, "mlp_ratio": [3.5] * 14}
        out14 = model.apply(variables, x, encode_config(cfg14, space))
        assert not np.allclose(np.asarray(out12), np.asarray(out14))


class TestEvolution:
    def test_search_improves_and_checkpoints(self):
        space = SPACES["tiny"]
        target = {"embed_dim": 240, "layer_num": 14}

        def eval_fn(cfg):
            # synthetic fitness: prefer big embed + depth + many heads
            return (cfg["embed_dim"][0] / 240 + cfg["layer_num"] / 14
                    + sum(cfg["num_heads"]) / (4 * 14))

        searcher = EvolutionSearcher(
            sample_fn=lambda rng: sample_config(rng, space),
            eval_fn=eval_fn,
            mutate_fn=lambda rng, c: autoformer_mutate(rng, c, space),
            crossover_fn=autoformer_crossover,
            is_legal_extra=lambda c: config_param_count(c) < 1e8,
            population_num=16, select_num=4, mutation_num=8, crossover_num=8,
            max_epochs=5, seed=0)
        top = searcher.search(log=lambda *_: None)
        assert top[0][0] >= 2.8  # near-optimal config found
        best = top[0][1]
        assert best["embed_dim"][0] == 240 and best["layer_num"] == 14

        # checkpoint roundtrip
        state = searcher.state_dict()
        s2 = EvolutionSearcher(
            sample_fn=lambda rng: sample_config(rng, space), eval_fn=eval_fn,
            mutate_fn=lambda rng, c: autoformer_mutate(rng, c, space),
            crossover_fn=autoformer_crossover, max_epochs=5)
        s2.load_state_dict(state)
        assert s2.top_k[0][0] == searcher.top_k[0][0]

    def test_param_window_legality(self):
        space = SPACES["tiny"]
        searcher = EvolutionSearcher(
            sample_fn=lambda rng: sample_config(rng, space),
            eval_fn=lambda c: 1.0,
            mutate_fn=lambda rng, c: autoformer_mutate(rng, c, space),
            crossover_fn=autoformer_crossover,
            is_legal_extra=lambda c: config_param_count(c) <= 6e6,
            population_num=8, select_num=2, mutation_num=2, crossover_num=2,
            max_epochs=1, seed=1)
        searcher.search(log=lambda *_: None)
        for _, cfg in searcher.top_k:
            assert config_param_count(cfg) <= 6e6
