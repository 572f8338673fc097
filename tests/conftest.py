"""Test harness: force an 8-virtual-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication).

Note: the axon site config overrides the JAX_PLATFORMS env var, so we must use
jax.config.update before any backend is initialized.

Set CREAM_TPU_TESTS=1 to keep the real TPU backend instead — enables the
tests/test_tpu_train_path.py hardware guards (everything else still passes,
just slower and at TPU matmul precision).
"""
import os

import jax

if not os.environ.get("CREAM_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    assert len(jax.devices()) == 8, jax.devices()
jax.config.update("jax_default_matmul_precision", "highest")
