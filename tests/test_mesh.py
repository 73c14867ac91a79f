import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mmrp_tpu.parallel.mesh import (
    DEFAULT_TP_RULES,
    batch_sharding,
    build_mesh,
    param_shardings,
    shard_params,
)


def test_build_mesh_shapes():
    m = build_mesh(("dp",), (8,))
    assert m.shape == {"dp": 8}
    m2 = build_mesh(("dp", "tp"), (4, 2))
    assert m2.shape == {"dp": 4, "tp": 2}
    m3 = build_mesh(("dp", "tp"), (-1, 2))
    assert m3.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        build_mesh(("dp",), (3,))


def test_param_shardings_tp_rules():
    mesh = build_mesh(("dp", "tp"), (4, 2))
    params = {
        "cls_hidden": {"kernel": jnp.zeros((16, 64)), "bias": jnp.zeros(64)},
        "cls_out": {"kernel": jnp.zeros((64, 43)), "bias": jnp.zeros(43)},
        "other": {"kernel": jnp.zeros((7, 7))},
    }
    sh = param_shardings(params, mesh)
    assert sh["cls_hidden"]["kernel"].spec == P(None, "tp")
    assert sh["cls_out"]["kernel"].spec == P("tp", None)
    assert sh["cls_hidden"]["bias"].spec == P()
    assert sh["other"]["kernel"].spec == P()  # no rule matched


def test_param_shardings_fallback_when_indivisible():
    mesh = build_mesh(("dp", "tp"), (4, 2))
    params = {"cls_hidden": {"kernel": jnp.zeros((16, 63))}}  # 63 % 2 != 0
    sh = param_shardings(params, mesh)
    assert sh["cls_hidden"]["kernel"].spec == P()


def test_param_shardings_pure_dp_mesh():
    mesh = build_mesh(("dp",), (8,))
    params = {"cls_hidden": {"kernel": jnp.zeros((16, 64))}}
    sh = param_shardings(params, mesh)  # tp axis absent -> replicate
    assert sh["cls_hidden"]["kernel"].spec == P()


def test_shard_params_places_arrays():
    mesh = build_mesh(("dp", "tp"), (4, 2))
    params = {"cls_hidden": {"kernel": jnp.ones((16, 64))}}
    placed = shard_params(params, mesh)
    arr = placed["cls_hidden"]["kernel"]
    assert arr.sharding.spec == P(None, "tp")
    np.testing.assert_allclose(np.asarray(arr), np.ones((16, 64)))


def test_batch_sharding_applies():
    mesh = build_mesh(("dp",), (8,))
    x = jnp.ones((16, 4))
    placed = jax.device_put(x, batch_sharding(mesh))
    assert placed.sharding.spec == P("dp")
    assert len(placed.addressable_shards) == 8
