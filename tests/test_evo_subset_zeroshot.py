"""EVO_IMNET fixed-subset parity + device-sharded zero-shot build."""
import os
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cream_tpu.data.imagenet import ImageFolder, sub_imagenet


def _make_tree(root, classes=5, per_class=12):
    rng = np.random.default_rng(0)
    for c in range(classes):
        d = os.path.join(root, f"n{c:08d}")
        os.makedirs(d)
        for j in range(per_class):
            # shuffled creation order; listdir order must not matter
            open(os.path.join(d, f"img_{rng.integers(1e6):06d}_{j}.jpg"),
                 "w").close()


class TestSubImageNet:
    def test_matches_reference_selection(self, tmp_path):
        """Same membership as AutoFormer/lib/subImageNet.py:
        random.seed(0); per sorted class: random.sample(sorted(names), k)."""
        _make_tree(str(tmp_path))
        ds = ImageFolder(str(tmp_path))
        k = 7
        sub = sub_imagenet(ds, per_class=k, seed=0)

        ref = random.Random(0)
        want = []
        for c in sorted(os.listdir(tmp_path)):
            names = sorted(os.listdir(tmp_path / c))
            want.extend(os.path.join(str(tmp_path), c, n)
                        for n in ref.sample(names, k))
        got = [p for p, _ in sub.samples]
        assert got == want

    def test_fixed_population(self, tmp_path):
        _make_tree(str(tmp_path))
        ds = ImageFolder(str(tmp_path))
        a = sub_imagenet(ds, per_class=3)
        b = sub_imagenet(ImageFolder(str(tmp_path)), per_class=3)
        assert [p for p, _ in a.samples] == [p for p, _ in b.samples]
        labels = [l for _, l in a.samples]
        assert all(labels.count(i) == 3 for i in range(5))


class TestShardedZeroShotBuild:
    def test_mesh_build_matches_unsharded(self):
        from cream_tpu.core.mesh import create_mesh
        from cream_tpu.train.zero_shot import build_zero_shot_classifier

        D = 16
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.standard_normal((64, D)), jnp.float32)

        def fake_tok(texts):
            return np.asarray([[hash(t) % 64] for t in texts], np.int32)

        @jax.jit
        def fake_encode(tokens):
            e = table[tokens[:, 0]]
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

        names = [f"thing {i}" for i in range(23)]   # odd count -> padding
        plain = build_zero_shot_classifier(fake_encode, fake_tok, names,
                                           batch_size=9)
        mesh = create_mesh()
        sharded = build_zero_shot_classifier(fake_encode, fake_tok, names,
                                             batch_size=9, mesh=mesh)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded),
                                   atol=1e-6)
