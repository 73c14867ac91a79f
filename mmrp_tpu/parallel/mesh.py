"""Device mesh + sharding utilities.

The reference is single-process single-GPU (SURVEY §2.9); this module is the
framework's distributed backbone: a named ``jax.sharding.Mesh`` over ICI
(and DCN when multi-slice), NamedSharding helpers for batch/param/gallery
placement, and rule-based parameter partitioning (tensor parallelism for
the wide matmuls) — all resolved at trace time so XLA inserts the
collectives.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    axis_names: Sequence[str] = ("dp",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a mesh over the available devices.

    ``axis_sizes`` may contain one -1 (filled with the remaining devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    sizes = list(axis_sizes)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh {tuple(sizes)} != {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, data_axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Default tensor-parallel rules: shard the widest matmuls of the model over
# the "tp" axis when it exists. Keys are regexes over the '/'-joined param
# path; values are PartitionSpecs (by param dimension).
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    (r".*cls_hidden/kernel$", P(None, "tp")),   # (D, 4D) column-parallel
    (r".*cls_out/kernel$", P("tp", None)),      # (4D, C) row-parallel
    (r".*ffn/Dense_0/kernel$", P(None, "tp")),  # fusion FFN in
    (r".*ffn/Dense_1/kernel$", P("tp", None)),  # fusion FFN out
    (r".*ffn_in/kernel$", P(None, "tp")),       # text FFN in
    (r".*ffn_out/kernel$", P("tp", None)),      # text FFN out
]


def param_shardings(params, mesh: Mesh, rules: Optional[List[Tuple[str, P]]] = None):
    """Pytree of NamedShardings: rule-matched params sharded, rest replicated.

    Rules referencing mesh axes that don't exist (or don't divide the dim)
    fall back to replication, so the same rules work on a pure-dp mesh.
    """
    if rules is None:
        rules = DEFAULT_TP_RULES
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    def spec_ok(spec: P, shape) -> bool:
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            names = (axis,) if isinstance(axis, str) else tuple(axis)
            size = int(np.prod([axis_sizes.get(a, 0) for a in names]))
            if size == 0 or dim >= len(shape) or shape[dim] % size != 0:
                return False
        return True

    out = []
    for path, leaf in flat:
        ps = path_str(path)
        chosen = P()
        for pat, spec in compiled:
            if pat.match(ps) and spec_ok(spec, leaf.shape):
                chosen = spec
                break
        out.append(NamedSharding(mesh, chosen))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params(params, mesh: Mesh, rules=None):
    """Place a (host or single-device) param pytree onto the mesh."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
