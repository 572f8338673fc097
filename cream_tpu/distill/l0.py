"""L0 structured pruning via hard-concrete gates (TinyCLIP).

Functional rebuild of TinyCLIP/src/open_clip/l0module.py:11-368 (itself from
CoFiPruning): per-granularity log-alpha parameters {hidden, heads, mha,
intermediate, ffn}, stretched-concrete sampling during training,
deterministic masks at inference, and an expected-sparsity lagrangian with
learned multipliers lambda_1/lambda_2.

JAX notes: the module is a plain params pytree + pure functions (sampling
takes an explicit rng). The lambdas must ASCEND the lagrangian; use
`lambda_sign_mask` with optax to flip their gradient inside a single
optimizer — equivalent to the reference's adversarial multiplier update.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

LIMIT_A, LIMIT_B, EPS = -0.1, 1.1, 1e-6
TEMPERATURE = 2.0 / 3.0
MAGICAL_NUMBER = 0.8


@dataclasses.dataclass(frozen=True)
class L0Config:
    hidden_size: int
    intermediate_size: int
    num_attention_heads: int
    num_hidden_layers: int
    pruning_types: tuple = ("hidden", "heads", "intermediate", "layer")
    # Ragged towers (a previously-pruned model with per-layer head counts /
    # MLP widths — the reference l0module is uniform-only, which is why its
    # multi-stage scripts restart from uniform dims; here a pruned model is a
    # first-class citizen). When set, the corresponding loga params are
    # TUPLES of per-layer 1D arrays instead of a single (L, N) array.
    heads_per_layer: tuple | None = None
    intermediate_per_layer: tuple | None = None

    @property
    def params_per_head(self) -> int:
        per_layer = self.hidden_size * self.hidden_size * 4 + self.hidden_size * 4
        return per_layer // self.num_attention_heads

    @property
    def params_per_intermediate_dim(self) -> int:
        per_layer = (self.hidden_size * self.intermediate_size * 2
                     + self.hidden_size + self.intermediate_size)
        return per_layer // self.intermediate_size

    @property
    def total_heads(self) -> int:
        if self.heads_per_layer is not None:
            return sum(self.heads_per_layer)
        return self.num_hidden_layers * self.num_attention_heads

    @property
    def total_intermediate(self) -> int:
        if self.intermediate_per_layer is not None:
            return sum(self.intermediate_per_layer)
        return self.num_hidden_layers * self.intermediate_size

    @property
    def prunable_model_size(self) -> int:
        n = 0
        if "heads" in self.pruning_types or "layer" in self.pruning_types:
            n += self.params_per_head * self.total_heads
        if "intermediate" in self.pruning_types:
            n += self.params_per_intermediate_dim * self.total_intermediate
        return n


def init_l0_params(cfg: L0Config, init_mean: float = 10.0) -> dict:
    """log-alphas start strongly 'keep-everything' (reference default_mean=10)."""
    L, H, I, W = (cfg.num_hidden_layers, cfg.num_attention_heads,
                  cfg.intermediate_size, cfg.hidden_size)
    p = {}
    if "hidden" in cfg.pruning_types:
        p["hidden_loga"] = jnp.full((W,), init_mean, jnp.float32)
    if "heads" in cfg.pruning_types:
        p["heads_loga"] = tuple(
            jnp.full((h,), init_mean, jnp.float32)
            for h in cfg.heads_per_layer) \
            if cfg.heads_per_layer is not None \
            else jnp.full((L, H), init_mean, jnp.float32)
    if "intermediate" in cfg.pruning_types:
        p["intermediate_loga"] = tuple(
            jnp.full((i,), init_mean, jnp.float32)
            for i in cfg.intermediate_per_layer) \
            if cfg.intermediate_per_layer is not None \
            else jnp.full((L, I), init_mean, jnp.float32)
    if "layer" in cfg.pruning_types:
        p["mha_loga"] = jnp.full((L,), init_mean, jnp.float32)
        p["ffn_loga"] = jnp.full((L,), init_mean, jnp.float32)
    p["lambda_1"] = jnp.asarray(10.0, jnp.float32)
    p["lambda_2"] = jnp.asarray(10.0, jnp.float32)
    return p


def lambda_sign_mask(params: dict) -> dict:
    """-1 on the lagrangian multipliers, +1 elsewhere (gradient-ascent trick).
    Mirrors the full pytree structure (ragged loga entries are tuples)."""
    return {k: jax.tree_util.tree_map(
        lambda _: -1.0 if k.startswith("lambda") else 1.0, v)
        for k, v in params.items()}


def _cdf_qz0(loga):
    """P(z<=0) under the stretched concrete (l0module.py:141-146)."""
    xn = (0.0 - LIMIT_A) / (LIMIT_B - LIMIT_A)
    logits = math.log(xn) - math.log(1.0 - xn)
    return jnp.clip(jax.nn.sigmoid(logits * TEMPERATURE - loga), EPS, 1 - EPS)


def score_loga(loga):
    """Probability the gate is nonzero."""
    return 1.0 - _cdf_qz0(loga)


def sample_z(rng: jax.Array, loga: jnp.ndarray) -> jnp.ndarray:
    """Training-time hard-concrete sample (l0module.py:228-237)."""
    u = jax.random.uniform(rng, loga.shape, minval=EPS, maxval=1 - EPS)
    z = jax.nn.sigmoid((jnp.log(u) - jnp.log(1 - u) + loga) / TEMPERATURE)
    z = z * (LIMIT_B - LIMIT_A) + LIMIT_A
    return jnp.clip(z, 0.0, 1.0)


def deterministic_z(loga: jnp.ndarray, soft: bool = True) -> jnp.ndarray:
    """Inference-time mask (l0module.py:241-255): soft sigmoid mask with the
    expected number of zeros hard-zeroed at the smallest entries."""
    soft_mask = jax.nn.sigmoid(loga / TEMPERATURE * MAGICAL_NUMBER)
    if not soft:
        return soft_mask
    expected_zeros = loga.size - float(np.asarray(score_loga(loga)).sum())
    num_zeros = round(expected_zeros)
    if num_zeros > 0:
        flat = np.asarray(soft_mask).reshape(-1)
        idx = np.argsort(flat)[:num_zeros]
        flat = flat.copy()
        flat[idx] = 0.0
        soft_mask = jnp.asarray(flat.reshape(soft_mask.shape))
    return soft_mask


def _deterministic_rows(rows) -> tuple:
    """deterministic_z across ragged per-layer rows with the hard-zero
    budget computed GLOBALLY (same semantics as the uniform (L, N) array)."""
    sizes = [int(r.size) for r in rows]
    nonempty = [r for r in rows if r.size]
    if not nonempty:
        return tuple(rows)
    flat = deterministic_z(jnp.concatenate(nonempty))
    out, off = [], 0
    for s in sizes:
        out.append(flat[off:off + s] if s else jnp.zeros((0,), jnp.float32))
        off += s
    return tuple(out)


def sample_masks(rng: jax.Array, params: dict, cfg: L0Config,
                 training: bool = True) -> dict:
    """Returns the model-facing mask dict {hidden_z, heads_z, mha_z,
    intermediate_z, ffn_z} (entries None when that type isn't pruned).
    Ragged loga entries (tuples of per-layer rows) yield tuple masks —
    `masks[name][i]` indexes identically for both layouts."""
    out = {"hidden_z": None, "heads_z": None, "mha_z": None,
           "intermediate_z": None, "ffn_z": None}
    names = {"hidden_loga": "hidden_z", "heads_loga": "heads_z",
             "mha_loga": "mha_z", "intermediate_loga": "intermediate_z",
             "ffn_loga": "ffn_z"}
    for pname, mname in names.items():
        if pname not in params:
            continue
        loga = params[pname]
        if isinstance(loga, (list, tuple)):
            if training:
                zs = []
                for row in loga:
                    rng, sub = jax.random.split(rng)
                    zs.append(sample_z(sub, row))
                out[mname] = tuple(zs)
            else:
                out[mname] = _deterministic_rows(loga)
        elif training:
            rng, sub = jax.random.split(rng)
            out[mname] = sample_z(sub, loga)
        else:
            out[mname] = deterministic_z(loga)
    return out


def _score_sums(params: dict, key: str, branch: jnp.ndarray,
                sizes) -> jnp.ndarray:
    """sum_i branch[i] * sum(score(loga_row_i)); rows default to all-ones of
    the per-layer size when the type isn't pruned. Handles both the uniform
    (L, N) layout and ragged tuples."""
    if key in params:
        loga = params[key]
        rows = list(loga) if isinstance(loga, (list, tuple)) \
            else [loga[i] for i in range(loga.shape[0])]
        per_layer = [score_loga(r).sum() if r.size else jnp.asarray(0.0)
                     for r in rows]
    else:
        per_layer = [jnp.asarray(float(s)) for s in sizes]
    return sum(b * s for b, s in zip(branch, per_layer))


def expected_sparsity(params: dict, cfg: L0Config) -> jnp.ndarray:
    """1 - expected-kept-params / prunable size (l0module.py:150-205)."""
    L = cfg.num_hidden_layers
    h_sizes = cfg.heads_per_layer if cfg.heads_per_layer is not None \
        else [cfg.num_attention_heads] * L
    i_sizes = cfg.intermediate_per_layer \
        if cfg.intermediate_per_layer is not None \
        else [cfg.intermediate_size] * L
    mha = score_loga(params["mha_loga"]) if "mha_loga" in params \
        else jnp.ones((L,))
    ffn = score_loga(params["ffn_loga"]) if "ffn_loga" in params \
        else jnp.ones((L,))

    heads_score = _score_sums(params, "heads_loga", mha, h_sizes)
    inter_score = _score_sums(params, "intermediate_loga", ffn, i_sizes)
    if "hidden_loga" in params:
        hidden = score_loga(params["hidden_loga"]).sum()
        num = hidden * heads_score * cfg.params_per_head / cfg.hidden_size
        num += hidden * inter_score * 2
    else:
        num = heads_score * cfg.params_per_head
        num += inter_score * cfg.params_per_intermediate_dim
    return 1.0 - num / cfg.prunable_model_size


def lagrangian_loss(params: dict, cfg: L0Config, target_sparsity: float,
                    pruned_steps: int | jnp.ndarray = 0,
                    warmup_steps: int = 0, start_sparsity: float = 0.0):
    """One-sided lagrangian (l0module.py:210-226): penalize only
    under-sparsity; lambdas learned adversarially (see lambda_sign_mask)."""
    if warmup_steps > 0:
        t = (target_sparsity - start_sparsity) * jnp.minimum(
            1.0, pruned_steps / warmup_steps) + start_sparsity
    else:
        t = jnp.asarray(target_sparsity)
    s = expected_sparsity(params, cfg)
    gap = jnp.maximum(t - s, 0.0)
    loss = params["lambda_1"] * gap + params["lambda_2"] * gap ** 2
    return loss, s, t
