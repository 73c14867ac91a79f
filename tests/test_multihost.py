"""Multi-host (multi-process) path, simulated on CPU: 2 processes x 4
virtual devices with gloo collectives — no TPU pod required.

Covers SURVEY §5.8's distributed backend end to end: jax.distributed
bootstrap via parallel.collectives.initialize_distributed, per-host data
sharding (data/pipeline.shard_for_host), a global 8-device mesh built
across processes, cross-host psum metric reduction (mean_over_mesh), and a
jitted global-batch train-like step whose loss/grads agree on both hosts.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MMRP_REPO"])

from mmrp_tpu.parallel.collectives import initialize_distributed, mean_over_mesh

ok = initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
    process_id=pid, cpu_collectives="gloo",
)
assert ok
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mmrp_tpu.data.pipeline import shard_for_host
from mmrp_tpu.parallel.mesh import build_mesh

assert len(jax.devices()) == 8 and jax.local_device_count() == 4
assert jax.process_count() == nproc and jax.process_index() == pid
mesh = build_mesh(("dp",), (8,))

# --- per-host data sharding -> global batch ------------------------------
records = [{"id": i, "x": float(i)} for i in range(16)]
mine = shard_for_host(records, pid, nproc)
assert len(mine) == 8 and all(r["id"] % nproc == pid for r in mine)

# --- cross-host metric reduction (psum over the global mesh) -------------
vals = np.arange(24, dtype=np.float32)  # same global array on both hosts
got = mean_over_mesh(mesh, vals)
assert abs(got - vals.mean()) < 1e-5, (got, vals.mean())

# --- global-batch train-like step ----------------------------------------
# each host contributes its local half of a global batch of 8 rows
local = np.stack([np.full(4, r["id"], np.float32) for r in mine[:4]])
sharding = NamedSharding(mesh, P("dp"))
gx = jax.make_array_from_process_local_data(sharding, local, (8, 4))
w = jnp.ones((4,), jnp.float32)

def loss(w, x):
    return jnp.mean((x @ w) ** 2)

l, g = jax.jit(jax.value_and_grad(loss))(w, gx)
print(f"RESULT {pid} {float(l):.6f} {float(g.sum()):.6f}", flush=True)
"""


def test_two_process_four_device_simulation(tmp_path):
    (tmp_path / "worker.py").write_text(WORKER)
    env = dict(os.environ, MMRP_REPO=str(REPO))
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    port = "29531"
    procs = [
        subprocess.Popen(
            [sys.executable, str(tmp_path / "worker.py"), str(i), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, l, gsum = line.split()
                results[pid] = (float(l), float(gsum))
    assert set(results) == {"0", "1"}
    # the jitted global computation must agree bitwise-ish across hosts
    assert abs(results["0"][0] - results["1"][0]) < 1e-6
    assert abs(results["0"][1] - results["1"][1]) < 1e-6
    # and match the host-side computation of the same global batch
    import numpy as np

    ids = np.array([0, 2, 4, 6, 1, 3, 5, 7], np.float32)  # host0 rows then host1
    want = float(np.mean((np.full((8, 4), ids[:, None]) @ np.ones(4)) ** 2))
    assert abs(results["0"][0] - want) < 1e-4
