"""Test harness: force an 8-virtual-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication).

Note: the axon site config overrides the JAX_PLATFORMS env var, so we must use
jax.config.update before any backend is initialized.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
