"""REAL multi-process execution of the multi-host path (CPU backend).

Round-3 gap: core/mesh.py's init_distributed + host-sharded loaders were
wired through the CLIs but never executed with process_count > 1, even on
CPU. This test spawns TWO actual processes that rendezvous through
jax.distributed, build one global 4-device mesh (2 local CPU devices each),
feed process-local loader slices through shard_batch
(make_array_from_process_local_data), and run a jitted data-parallel
gradient step — asserting the all-reduced gradient matches the single-host
oracle computed over the full batch.

Reference counterpart: TinyCLIP/src/training/distributed.py:23-110 (env
bring-up + process groups) and every project's DistributedSampler loaders.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)   # 2 local x 2 procs = 4

    from cream_tpu.core.mesh import (create_mesh, init_distributed,
                                     process_shard, shard_batch)

    assert init_distributed(), "expected multi-process"
    import jax.numpy as jnp
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    mesh = create_mesh()                      # all 4 devices on 'data'
    # host-sharded "loader": each process materializes ONLY its own strided
    # slice of the global sample order (the DistributedSampler contract)
    order = process_shard(8)
    full = (jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3) + 1.0)
    local = jax.device_get(full)[order]       # process-local samples
    batch = shard_batch(mesh, {"x": local})

    w = jnp.ones((3,), jnp.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P
    w = jax.device_put(w, NamedSharding(mesh, P()))

    @jax.jit
    def grad_step(w, x):
        # mean-of-squares loss -> dL/dw = 2/N * sum_i x_i**2 * w
        return jax.grad(lambda w: jnp.mean((x * w) ** 2))(w)

    g = jax.device_get(grad_step(w, batch["x"]))

    if jax.process_index() == 0:
        # mean is over all N*3 elements, so dL/dw_j = 2/(N*3) * sum_i x_ij^2 w_j
        oracle = 2.0 / (8 * 3) * (jax.device_get(full) ** 2).sum(0)
        out = {"grad": g.tolist(), "oracle": oracle.tolist(),
               "order": [int(i) for i in order]}
        with open(sys.argv[1], "w") as f:
            json.dump(out, f)
""")


@pytest.mark.slow
def test_two_process_data_parallel_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    result = tmp_path / "result.json"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + env.get("PYTHONPATH", "").split(os.pathsep))
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(result)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    got = json.loads(result.read_text())
    # the two host shards must be disjoint strided slices
    assert got["order"] == [0, 2, 4, 6]
    np.testing.assert_allclose(np.asarray(got["grad"]),
                               np.asarray(got["oracle"]), rtol=1e-6)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
