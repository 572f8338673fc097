"""Shared test helpers."""
import jax


def jit_init(model, *args, seed: int = 1, **kwargs):
    """model.init under jit — orders of magnitude faster than eager init on CPU."""
    return jax.jit(lambda k: model.init(k, *args, **kwargs))(jax.random.key(seed))


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
