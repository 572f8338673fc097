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
    def prunable_model_size(self) -> int:
        n = 0
        if "heads" in self.pruning_types or "layer" in self.pruning_types:
            n += self.params_per_head * self.num_hidden_layers * self.num_attention_heads
        if "intermediate" in self.pruning_types:
            n += self.params_per_intermediate_dim * self.num_hidden_layers * self.intermediate_size
        return n


def init_l0_params(cfg: L0Config, init_mean: float = 10.0) -> dict:
    """log-alphas start strongly 'keep-everything' (reference default_mean=10)."""
    L, H, I, W = (cfg.num_hidden_layers, cfg.num_attention_heads,
                  cfg.intermediate_size, cfg.hidden_size)
    p = {}
    if "hidden" in cfg.pruning_types:
        p["hidden_loga"] = jnp.full((W,), init_mean, jnp.float32)
    if "heads" in cfg.pruning_types:
        p["heads_loga"] = jnp.full((L, H), init_mean, jnp.float32)
    if "intermediate" in cfg.pruning_types:
        p["intermediate_loga"] = jnp.full((L, I), init_mean, jnp.float32)
    if "layer" in cfg.pruning_types:
        p["mha_loga"] = jnp.full((L,), init_mean, jnp.float32)
        p["ffn_loga"] = jnp.full((L,), init_mean, jnp.float32)
    p["lambda_1"] = jnp.asarray(10.0, jnp.float32)
    p["lambda_2"] = jnp.asarray(10.0, jnp.float32)
    return p


def lambda_sign_mask(params: dict) -> dict:
    """-1 on the lagrangian multipliers, +1 elsewhere (gradient-ascent trick)."""
    return {k: (-1.0 if k.startswith("lambda") else 1.0) for k in params}


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


def sample_masks(rng: jax.Array, params: dict, cfg: L0Config,
                 training: bool = True) -> dict:
    """Returns the model-facing mask dict {hidden_z, heads_z, mha_z,
    intermediate_z, ffn_z} (entries None when that type isn't pruned)."""
    out = {"hidden_z": None, "heads_z": None, "mha_z": None,
           "intermediate_z": None, "ffn_z": None}
    names = {"hidden_loga": "hidden_z", "heads_loga": "heads_z",
             "mha_loga": "mha_z", "intermediate_loga": "intermediate_z",
             "ffn_loga": "ffn_z"}
    for pname, mname in names.items():
        if pname not in params:
            continue
        if training:
            rng, sub = jax.random.split(rng)
            out[mname] = sample_z(sub, params[pname])
        else:
            out[mname] = deterministic_z(params[pname])
    return out


def expected_sparsity(params: dict, cfg: L0Config) -> jnp.ndarray:
    """1 - expected-kept-params / prunable size (l0module.py:150-205)."""
    L, H, I, W = (cfg.num_hidden_layers, cfg.num_attention_heads,
                  cfg.intermediate_size, cfg.hidden_size)
    mha = score_loga(params["mha_loga"]).reshape(L, 1) \
        if "mha_loga" in params else jnp.ones((L, 1))
    heads = score_loga(params["heads_loga"]) \
        if "heads_loga" in params else jnp.ones((L, H))
    ffn = score_loga(params["ffn_loga"]).reshape(L, 1) \
        if "ffn_loga" in params else jnp.ones((L, 1))
    inter = score_loga(params["intermediate_loga"]) \
        if "intermediate_loga" in params else jnp.ones((L, I))

    heads_score = (heads * mha).reshape(-1)
    inter_score = (inter * ffn).reshape(-1)
    if "hidden_loga" in params:
        hidden = score_loga(params["hidden_loga"])
        num = (jnp.outer(hidden, heads_score).sum()
               * cfg.params_per_head / cfg.hidden_size)
        num += jnp.outer(hidden, inter_score).sum() * 2
    else:
        num = heads_score.sum() * cfg.params_per_head
        num += inter_score.sum() * cfg.params_per_intermediate_dim
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
