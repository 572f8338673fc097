"""CDARTS multi-stage controller: param copy correctness + staged smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cream_tpu.models.darts import PRIMITIVES
from cream_tpu.nas.cdarts_stage import (
    CDARTSController, MultiStageSearcher, StageSearchConfig,
    copy_nas_to_super, copy_super_to_nas, init_stage_alphas,
    parse_stage_genotype, transfer_variables)


def _leaf_equal(a, b):
    return jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda x, y: bool(jnp.array_equal(x, y)), a, b))


class TestParamCopy:
    def setup_method(self):
        self.alphas = init_stage_alphas(jax.random.key(0), n_nodes=2)
        g = parse_stage_genotype(self.alphas, n_nodes=2)
        self.model = CDARTSController(
            genotypes=(g, g), num_classes=10, layer_num=2, cells_per_layer=1,
            n_nodes=2, C=8, aux_pool_size=4)
        x = jnp.zeros((2, 32, 32, 3))
        self.vars = jax.device_get(jax.jit(
            lambda r: self.model.init(r, x, self.alphas, init_all=True))(
                jax.random.key(1)))
        self.g = g

    def test_super_to_nas_copies_chosen_ops(self):
        out = copy_super_to_nas(self.vars, self.model, [0, 1])
        p = out["params"]
        # every nas edge with parameters must equal the chosen super op
        for li in (0, 1):
            red = li == 0 and self.model.cells_per_layer == 1 and li < 1
            gene = self.g.reduce if red else self.g.normal
            for node, edges in enumerate(gene):
                for e, (op, s_idx) in enumerate(edges):
                    stride = 2 if red and s_idx < 2 else 1
                    if op == "none" or (op == "skip_connect" and stride == 1):
                        continue
                    # pool ops carry only batch_stats (affine-free BN);
                    # conv ops carry params too — check both collections
                    for coll in ("params", "batch_stats"):
                        tree = out[coll]
                        sup = tree[f"super_{li}_0"].get(
                            f"dag_{node}_{s_idx}", {}).get(
                            f"op_{PRIMITIVES.index(op)}")
                        if sup is None:
                            continue
                        nas = tree[f"nas_{li}_0"].get(f"dag_{node}_{e}")
                        assert nas is not None, (coll, li, node, e, op)
                        assert _leaf_equal(nas, sup)
        # preproc weights copied too
        assert _leaf_equal(p["nas_0_0"]["preproc0"],
                           p["super_0_0"]["preproc0"])

    def test_roundtrip_nas_to_super(self):
        out = copy_super_to_nas(self.vars, self.model, [0, 1])
        # mutate a nas op then copy back
        p = jax.tree_util.tree_map(lambda x: x, out)
        back = copy_nas_to_super(p, self.model, [0, 1])
        gene = self.g.normal
        for node, edges in enumerate(gene):
            for e, (op, s_idx) in enumerate(edges):
                if op in ("none", "skip_connect"):
                    continue
                for coll in ("params", "batch_stats"):
                    nas = p[coll]["nas_1_0"].get(f"dag_{node}_{e}")
                    if nas is None:
                        continue
                    sup = back[coll]["super_1_0"][f"dag_{node}_{s_idx}"][
                        f"op_{PRIMITIVES.index(op)}"]
                    assert _leaf_equal(sup, nas)

    def test_transfer_variables_preserves_matching(self):
        fresh = jax.tree_util.tree_map(jnp.zeros_like, self.vars)
        merged = transfer_variables(fresh, self.vars)
        assert _leaf_equal(merged, self.vars)

    def test_forward_paths(self):
        x = jnp.zeros((2, 32, 32, 3))
        lg, em = self.model.apply(self.vars, x, self.alphas, layer_idx=1,
                                  super_flag=True)
        assert lg.shape == (2, 10) and em.shape == (2, 10)
        lg2, em2 = self.model.apply(self.vars, x, self.alphas,
                                    super_flag=False)
        assert lg2.shape == (2, 10)
        lgp, aux = self.model.apply(self.vars, x, self.alphas, pretrain=True)
        assert lgp.shape == (2, 10) and aux.shape == (2, 10)


@pytest.mark.slow
class TestStagedSearch:
    def test_full_campaign_smoke(self):
        cfg = StageSearchConfig(layer_num=2, cells_per_layer=1, n_nodes=2,
                                C=8, pretrain_epochs=1, search_iters=1,
                                steps_per_iter=1, aux_pool_size=4)
        rng = np.random.default_rng(0)
        def batches():
            def gen():
                for _ in range(1):
                    yield {"image": jnp.asarray(
                               rng.standard_normal((4, 32, 32, 3)),
                               jnp.float32),
                           "label": jnp.asarray(rng.integers(0, 10, 4))}
            return gen
        sample = next(iter(batches()()))
        s = MultiStageSearcher(cfg, jax.random.key(0), sample)
        genotypes, history = s.run(batches(), batches(), log=lambda *a: None)
        assert len(genotypes) == 2
        assert len(history) == 2
        for h in history:
            assert np.isfinite(h["val_acc"])
            assert len(h["genotype"].normal) == 2
