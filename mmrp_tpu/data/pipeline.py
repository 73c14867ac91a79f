"""Host-side input pipeline: threaded prefetch + per-host sharding.

TPU-native replacement for the reference's
``DataLoader(num_workers=4, pin_memory=True)`` (reference:
src/DataHandler/dataLoader.py:51-62): a thread pool decodes/preprocesses
DICOMs ahead of the train step, a bounded queue applies back-pressure, and
``shard_for_host`` slices the record list per input host for multi-host
SPMD (each host feeds its local devices; there is no global shuffle
coordination needed because sampling is seeded identically everywhere and
sliced by host id).

When the native C++ decode library (native/libmmrp_io.so) is present it is
used for the DICOM->tensor hot path; the pure-Python decoder is the fallback.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


class PrefetchLoader:
    """Wrap a batch iterable with N worker threads + a bounded queue."""

    def __init__(self, inner, num_workers: int = 4, prefetch: int = 8):
        self.inner = inner
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.inner)

    # Delegate the BatchIterator surface consumers rely on: ``.ds`` (label
    # stats in run_joint_training) and ``._epoch`` (resume reseeds the data
    # order). The _epoch setter must reach the INNER iterator — setting a
    # plain attribute on the wrapper would silently break resume determinism.
    @property
    def ds(self):
        return self.inner.ds

    @property
    def _epoch(self) -> int:
        return self.inner._epoch

    @_epoch.setter
    def _epoch(self, value: int) -> None:
        self.inner._epoch = value

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # A single producer keeps batch order deterministic while the
        # consumer overlaps device work; per-sample decode parallelism
        # lives inside BatchIterator (its own num_workers thread pool).
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        err: List[BaseException] = []

        def produce() -> None:
            try:
                for batch in self.inner:
                    q.put(batch)
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]


def shard_for_host(
    records: Sequence[dict], host_id: int, num_hosts: int
) -> List[dict]:
    """Deterministic per-host slice (round-robin) of the record list."""
    return [r for i, r in enumerate(records) if i % num_hosts == host_id]


def device_put_sharded_batch(batch: Dict[str, np.ndarray], mesh, data_axis: str = "dp"):
    """Place a host batch onto the mesh, batch dim sharded over data_axis.

    Non-array entries (e.g. the id list) pass through untouched.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(data_axis))
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out
