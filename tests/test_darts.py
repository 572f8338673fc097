"""DARTS/CDARTS: ops, search cell, genotype decode, augment net, cyclic search."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cream_tpu.models.darts import (
    PRIMITIVES, AugmentCNN, Genotype, SearchCNN, init_alphas, n_alpha_edges,
    parse_genotype)
from cream_tpu.nas.cdarts import (
    CyclicSearcher, alpha_l1_regularization, make_alpha_step, make_weight_step)

from helpers import jit_init


def small_search_net():
    return SearchCNN(num_classes=4, C=8, n_layers=4, n_nodes=3)


@pytest.mark.slow
class TestSearchCNN:
    def test_forward_and_alpha_grad(self):
        model = small_search_net()
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
        alphas = init_alphas(jax.random.key(1), n_nodes=3)
        v = jit_init(model, x, alphas["normal"], alphas["reduce"])
        out = jax.jit(lambda v, x, a, b: model.apply(v, x, a, b))(
            v, x, alphas["normal"], alphas["reduce"])
        assert out.shape == (2, 4)

        def loss(a):
            return model.apply(v, x, a["normal"], a["reduce"]).sum()
        g = jax.grad(loss)(alphas)
        assert float(jnp.abs(g["normal"]).sum()) > 0
        assert float(jnp.abs(g["reduce"]).sum()) > 0

    def test_alpha_edge_count(self):
        assert n_alpha_edges(4) == 14  # 2+3+4+5


class TestGenotype:
    def test_parse_picks_dominant_ops(self):
        e = n_alpha_edges(4)
        a = np.full((e, len(PRIMITIVES)), -5.0, np.float32)
        # make sep_conv_3x3 dominant on edges 0,1 and the rest favor 'none'
        sep = PRIMITIVES.index("sep_conv_3x3")
        a[:, PRIMITIVES.index("none")] = 5.0
        a[0, sep] = 6.0
        a[1, sep] = 6.0
        geno = parse_genotype({"normal": a, "reduce": a})
        assert geno.normal[0][0] == ("sep_conv_3x3", 0)
        assert geno.normal[0][1] == ("sep_conv_3x3", 1)
        # 'none' never appears even where it dominates
        for edges in geno.normal + geno.reduce:
            for op, _ in edges:
                assert op != "none"

    def test_augment_cnn_from_genotype(self):
        geno = Genotype(
            normal=[[("sep_conv_3x3", 0), ("skip_connect", 1)],
                    [("dil_conv_3x3", 1), ("max_pool_3x3", 0)],
                    [("sep_conv_5x5", 2), ("avg_pool_3x3", 3)]],
            normal_concat=[2, 3, 4],
            reduce=[[("sep_conv_3x3", 0), ("skip_connect", 1)],
                    [("dil_conv_3x3", 1), ("max_pool_3x3", 0)],
                    [("sep_conv_5x5", 2), ("avg_pool_3x3", 3)]],
            reduce_concat=[2, 3, 4])
        model = AugmentCNN(genotype=geno, num_classes=4, C=8, n_layers=5)
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
        v = jit_init(model, x)
        out = jax.jit(lambda v, x: model.apply(v, x))(v, x)
        assert out.shape == (2, 4) and bool(jnp.isfinite(out).all())


@pytest.mark.slow
class TestCyclicSearch:
    def test_l1_reg_targets_paramfree_ops(self):
        e = n_alpha_edges(4)
        hot_pool = np.full((e, len(PRIMITIVES)), 0.0, np.float32)
        hot_pool[:, PRIMITIVES.index("max_pool_3x3")] = 5.0
        hot_conv = np.full((e, len(PRIMITIVES)), 0.0, np.float32)
        hot_conv[:, PRIMITIVES.index("sep_conv_3x3")] = 5.0
        r_pool = alpha_l1_regularization({"normal": jnp.asarray(hot_pool)})
        r_conv = alpha_l1_regularization({"normal": jnp.asarray(hot_conv)})
        assert float(r_pool) > float(r_conv)

    def test_search_loop_runs_and_improves(self):
        model = small_search_net()
        x = jax.random.normal(jax.random.key(0), (8, 32, 32, 3))
        y = jnp.arange(8) % 4
        alphas = init_alphas(jax.random.key(1), n_nodes=3)
        v = jit_init(model, x, alphas["normal"], alphas["reduce"])
        searcher = CyclicSearcher(model, alphas, v["params"], v["batch_stats"],
                                  weight_tx=optax.sgd(0.05, momentum=0.9))
        batch = {"image": x, "label": y}
        losses = [searcher.weight_step(batch) for _ in range(5)]
        assert losses[-1] < losses[0]
        a_before = np.asarray(searcher.alphas["normal"]).copy()
        searcher.alpha_step(batch)
        assert not np.allclose(a_before, np.asarray(searcher.alphas["normal"]))
        geno = searcher.genotype()
        assert len(geno.normal) == 3 and len(geno.reduce) == 3

    def test_interactive_alpha_step(self):
        model = small_search_net()
        x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
        y = jnp.arange(4) % 4
        alphas = init_alphas(jax.random.key(1), n_nodes=3)
        v = jit_init(model, x, alphas["normal"], alphas["reduce"])
        step = make_alpha_step(model, optax.adam(3e-4))
        eval_logits = jax.random.normal(jax.random.key(2), (4, 4))
        a2, _, loss = step(alphas, optax.adam(3e-4).init(alphas), v["params"],
                           v["batch_stats"], {"image": x, "label": y},
                           eval_logits)
        assert np.isfinite(loss)
