"""Cross-replica collective helpers.

The reference has no distributed communication at all (SURVEY §5.8); here
the framework's eval/metric reductions and multi-host hooks live in one
place: psum-based metric reduction inside shard_map programs, and a
host-level all-gather for eval artifacts.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_metric_psum(mesh: Mesh, axis: str = "dp"):
    """fn(values_shard, counts_shard) -> (global_sum, global_count) scalars.

    Use for sharded eval loops: each device sums its shard's metric
    numerator/denominator locally, psum combines over ICI.
    """

    def reduce_fn(v, c):
        return jax.lax.psum(v.sum(), axis), jax.lax.psum(c.sum(), axis)

    return jax.jit(
        shard_map(
            reduce_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def mean_over_mesh(mesh: Mesh, values: np.ndarray, axis: str = "dp") -> float:
    """Global mean of per-sample values, leading dim sharded over ``axis``."""
    values = np.asarray(values, np.float32)
    n = values.shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    pad = (-n) % n_dev
    if pad:
        values = np.concatenate([values, np.zeros(pad, values.dtype)])
    counts = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    sharding = NamedSharding(mesh, P(axis))
    red = make_metric_psum(mesh, axis)
    s, c = red(jax.device_put(jnp.asarray(values * counts), sharding),
               jax.device_put(jnp.asarray(counts), sharding))
    return float(s) / max(float(c), 1.0)


def initialize_distributed(
    coordinator_address: str = None,
    num_processes: int = None,
    process_id: int = None,
    cpu_collectives: str = None,
) -> bool:
    """Multi-host initialization (jax.distributed). Returns True when the
    distributed runtime was started.

    Explicit args win; otherwise standard envs are honored
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — on TPU
    pods jax.distributed.initialize() autodetects and the envs are not
    needed). ``cpu_collectives="gloo"`` enables cross-process collectives
    on the CPU backend, which is how the multi-host path is exercised in
    CI without a pod (tests/test_multihost.py)."""
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes if num_processes is not None else os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    process_id = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID"
    )
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True
