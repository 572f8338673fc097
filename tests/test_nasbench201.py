"""NAS-Bench-201 space: structure codec, search/infer nets, discretization
parity, CyclicSearcher integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.models.nasbench201 import (EDGES, NB201_OPS, N_EDGES,
                                          TinyNetwork201,
                                          TinyNetwork201Infer,
                                          init_alphas_201, parse_structure,
                                          structure_check_valid,
                                          structure_fromstr, structure_tostr)


class TestStructure:
    def test_tostr_canonical_format(self):
        # canonical NAS-Bench-201 arch string (e.g. the space's best cell as
        # published in the bench's README / API docs)
        g = ((("nor_conv_3x3", 0),),
             (("nor_conv_3x3", 0), ("nor_conv_3x3", 1)),
             (("skip_connect", 0), ("nor_conv_1x1", 1), ("skip_connect", 2)))
        s = structure_tostr(g)
        assert s == ("|nor_conv_3x3~0|+|nor_conv_3x3~0|nor_conv_3x3~1|+"
                     "|skip_connect~0|nor_conv_1x1~1|skip_connect~2|")
        assert structure_fromstr(s) == g

    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            g = tuple(
                tuple((NB201_OPS[rng.integers(5)], j) for j in range(i))
                for i in range(1, 4))
            assert structure_fromstr(structure_tostr(g)) == g

    def test_check_valid(self):
        all_none = tuple(tuple(("none", j) for j in range(i))
                         for i in range(1, 4))
        assert not structure_check_valid(all_none)
        g = ((("none", 0),),
             (("skip_connect", 0), ("none", 1)),
             (("none", 0), ("none", 1), ("nor_conv_3x3", 2)))
        assert structure_check_valid(g)
        # output fed through a live chain -> valid
        g2 = ((("none", 0),),
              (("skip_connect", 0),),
              (("nor_conv_3x3", 2),))
        assert structure_check_valid(g2)
        g3 = ((("none", 0),),
              (("skip_connect", 0),),
              (("nor_conv_3x3", 1),))   # node1 dead, output reads node1
        assert not structure_check_valid(g3)

    def test_parse_structure_argmax(self):
        a = np.zeros((N_EDGES, 5), np.float32)
        a[EDGES.index((1, 0)), 3] = 5.0    # nor_conv_3x3
        a[EDGES.index((3, 2)), 1] = 5.0    # skip_connect
        g = parse_structure({"normal": jnp.asarray(a)})
        assert g[0][0][0] == "nor_conv_3x3"
        assert g[2][2][0] == "skip_connect"
        assert all(op == "none" for op, _ in g[1])


def _copy_search_to_infer(sp, genotype, n_cells):
    """Map search-cell params (edge{i}_{j}_op{oi}) onto the infer net's
    chosen-op modules (edge{i}_{j}_{op})."""
    ip = {}
    for k, v in sp.items():
        if not k.startswith("cell_"):
            ip[k] = v
            continue
        cell = {}
        for ni, node in enumerate(genotype, start=1):
            for op, j in node:
                if op in ("none", "skip_connect", "avg_pool_3x3"):
                    continue
                oi = NB201_OPS.index(op)
                cell[f"edge{ni}_{j}_{op}"] = v[f"edge{ni}_{j}_op{oi}"]
        ip[k] = cell
    return ip


class TestNetworks:
    def test_search_forward_and_discretization_parity(self):
        """One-hot alphas through the search net == the discretized infer
        net with copied params (exact)."""
        model = TinyNetwork201(num_classes=7, C=8, N=1)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 16, 16, 3)), jnp.float32)
        a0 = init_alphas_201(jax.random.key(0))
        v = jax.jit(lambda r: model.init(r, x, a0["normal"]))(
            jax.random.key(1))

        onehot = np.full((N_EDGES, 5), -30.0, np.float32)
        picks = [3, 1, 2, 4, 3, 1]
        for e, p in enumerate(picks):
            onehot[e, p] = 30.0
        out_s = model.apply(v, x, jnp.asarray(onehot))
        assert out_s.shape == (2, 7)

        genotype = parse_structure(jnp.asarray(onehot))
        infer = TinyNetwork201Infer(genotype=genotype, num_classes=7, C=8,
                                    N=1)
        iv = jax.jit(lambda r: infer.init(r, x))(jax.random.key(1))
        ip = _copy_search_to_infer(v["params"], genotype, 3)
        out_i = infer.apply({"params": ip,
                             "batch_stats": iv["batch_stats"]}, x)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_i),
                                   atol=1e-5, rtol=1e-5)

    def test_cyclic_searcher_drives_201(self):
        """The shared CDARTS searcher runs weight+alpha steps on the 201
        net unchanged and yields a decodable genotype."""
        import optax
        from cream_tpu.nas.cdarts import CyclicSearcher

        model = TinyNetwork201(num_classes=4, C=4, N=1)
        rng = np.random.default_rng(1)
        batch = {"image": jnp.asarray(rng.standard_normal((4, 16, 16, 3)),
                                      jnp.float32),
                 "label": jnp.asarray(rng.integers(0, 4, 4))}
        alphas = init_alphas_201(jax.random.key(0))
        v = jax.jit(lambda r: model.init(r, batch["image"],
                                         alphas["normal"]))(jax.random.key(1))
        s = CyclicSearcher(model, alphas, v["params"], v["batch_stats"],
                           weight_tx=optax.sgd(0.01),
                           alpha_tx=optax.adam(1e-3))
        wl = s.weight_step(batch)
        al = s.alpha_step(batch)
        assert np.isfinite(wl) and np.isfinite(al)
        g = parse_structure(s.alphas)
        assert len(g) == 3 and structure_tostr(g).count("+") == 2
