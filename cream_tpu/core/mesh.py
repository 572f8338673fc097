"""Device mesh + sharding helpers.

This replaces the reference's entire distributed stack (torch.distributed NCCL
process groups, DDP wrappers, apex/horovod variants — e.g. AutoFormer/lib/utils.py:209-233,
Cream/tools/train.py:21-27, TinyCLIP/src/training/distributed.py:23-110) with a single
JAX device mesh. Data parallelism is expressed as a batch-axis NamedSharding and XLA
inserts the gradient all-reduce; metric reduction is a jnp.mean under the same jit.

Axes:
  data  — batch / data parallelism (ICI within slice, DCN across slices)
  model — tensor parallelism axis for wide layers (used by the CLIP towers'
          contrastive gather and optionally classifier heads)
"""
from __future__ import annotations

import functools
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axes: Mapping[str, int] | None = None,
                devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a Mesh. Default: all devices on a single 'data' axis.

    axes: ordered mapping axis-name -> size; total must equal device count.
          A size of -1 means "fill with remaining devices".
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh axes {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def init_distributed() -> bool:
    """Multi-host bring-up: jax.distributed.initialize() when the coordinator
    env is present (the role of the reference's init_process_group /
    init_distributed_mode — AutoFormer/lib/utils.py:209-233,
    TinyCLIP/src/training/distributed.py:23-110; SURVEY.md §5). Call BEFORE
    any other jax use on pods; a no-op single-host. Returns True when
    running multi-process.

    On Cloud TPU pods initialize() auto-detects everything from the TPU
    metadata; elsewhere (the reference's torchrun-style env bring-up,
    TinyCLIP/src/training/distributed.py:52-63) the process geometry comes
    from JAX_NUM_PROCESSES / JAX_PROCESS_ID next to the coordinator address
    — tests/test_multihost.py exercises this path for real with two CPU
    processes."""
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr:
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None)
    return jax.process_count() > 1


def process_shard(n_or_array, index: int | None = None,
                  count: int | None = None):
    """This host's strided slice of a sample order — the DistributedSampler
    role (each host reads only its own samples; union over hosts is exactly
    the full order, disjoint)."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if isinstance(n_or_array, int):
        n_or_array = np.arange(n_or_array)
    return n_or_array[index::count]


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch-leading array: shard dim 0 over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a batch pytree with dim-0 sharded over `axis`.

    Single-process: a plain sharded device_put. Multi-process (pod): each
    host passes its process-LOCAL slice (from a process_shard'ed loader) and
    the global jax.Array is assembled host-locally with
    make_array_from_process_local_data — no cross-host copy of pixels."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


@functools.cache
def default_mesh() -> Mesh:
    return create_mesh()


def partition_by_rules(params, rules, mesh: Mesh | None = None):
    """Map a params pytree to PartitionSpecs by regex path rules (first
    match wins; default = replicated). With `mesh`, returns NamedShardings
    ready for jax.jit in_shardings — the 'annotate shardings, let XLA
    insert collectives' recipe."""
    import re

    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(path) -> P:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pat, spec in compiled:
            if pat.fullmatch(name):
                return spec
        return P()

    def leaf(path, x):
        spec = spec_for(path)
        return NamedSharding(mesh, spec) if mesh is not None else spec

    return jax.tree_util.tree_map_with_path(leaf, params)


# Megatron-style tensor parallelism for the CLIP/DETR transformer towers
# (models/clip.py naming): qkv and MLP-in column-sharded, out-proj and
# MLP-out row-sharded. XLA's SPMD partitioner derives the activation
# shardings and inserts the row-parallel all-reduces.
CLIP_TP_RULES = (
    (r".*/attn/in_proj/kernel", P(None, "model")),
    (r".*/attn/in_proj/bias", P("model")),
    (r".*/attn/out_proj/kernel", P("model", None)),
    (r".*/c_fc/kernel", P(None, "model")),
    (r".*/c_fc/bias", P("model")),
    (r".*/c_proj/kernel", P("model", None)),
)
