"""shard_map DP train step == plain-jit GSPMD step (VERDICT r3 #2).

The DP step's point is to hand the Pallas window-attention CORE kernel
(ops/wattn_core.py) per-shard shapes on a multi-chip mesh — plain GSPMD
cannot partition the custom call, so models/swin.py forfeits the kernel
whenever device_count > 1. Correctness contract: with stochastic layers
off, one optimizer step through make_train_step_dp on the 8-device CPU
mesh must reproduce make_train_step exactly (same updated params, same
loss metrics), including the batch-coupled InfoNCE terms and the
kg-alignment branch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import __graft_entry__ as G
from mmrp_tpu.config import Config
from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.models.text_encoder import TextConfig
from mmrp_tpu.train.joint import init_train_state, make_train_step, make_train_step_dp

B, IMG, LTXT, VOCAB, KG_DIM = 16, 28, 8, 64, 12


def _setup(kg_dim=None, window_size=7):
    swin = SwinConfig(
        img_size=IMG, embed_dim=16, depths=(1,), num_heads=(2,),
        window_size=window_size, use_pallas=False, drop_path_rate=0.0,
    )
    text = TextConfig.small(
        vocab_size=VOCAB, hidden_dim=16, num_layers=1, num_heads=2,
        intermediate_dim=32, max_positions=16, dropout=0.0,
    )
    mm = MultiModalConfig(
        swin=swin, text=text, joint_dim=16, num_fusion_layers=1,
        num_heads=2, num_classes=43, max_text_len=LTXT,
        dropout=0.0, drop_path=0.0,
    )
    model = MultiModalRetrievalModel(mm)
    cfg = Config(lr=1e-3, batch_size=B)
    batch_np = G._example_batch(B=B, img=IMG, L=LTXT, vocab=VOCAB, seed=3,
                                kg_dim=kg_dim)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), batch,
                             total_steps=50, kg_dim=kg_dim)
    return model, cfg, batch, state


def _mesh():
    return Mesh(np.array(jax.devices()), ("dp",))


def _assert_states_match(s_ref, s_dp, atol):
    ref_leaves, _ = jax.tree_util.tree_flatten(s_ref.params)
    dp_leaves, _ = jax.tree_util.tree_flatten(s_dp.params)
    assert len(ref_leaves) == len(dp_leaves)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=atol, rtol=0,
        )


@pytest.mark.parametrize("kg_dim", [None, KG_DIM])
def test_dp_step_matches_plain_jit(kg_dim):
    model, cfg, batch, state0 = _setup(kg_dim=kg_dim)
    mesh = _mesh()

    step_ref = make_train_step(model, cfg, donate=False)
    s_ref, m_ref = step_ref(state0, batch)

    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("dp")))
        for k, v in batch.items()
    }
    step_dp = make_train_step_dp(model, cfg, mesh, donate=False,
                                 core_kernel=False)
    s_dp, m_dp = step_dp(state0, sharded)

    for k in m_ref:
        assert np.isclose(float(m_ref[k]), float(m_dp[k]), atol=1e-5), (
            k, float(m_ref[k]), float(m_dp[k]))
    _assert_states_match(s_ref, s_dp, atol=1e-6)


def test_dp_step_core_kernel_interpret_matches():
    """Same step with the CORE window-attention kernel FORCED ON per
    shard (interpret mode on CPU) — the configuration that ships on a
    real pod. Grad path goes through the kernel's hand-written backward,
    so tolerance is the kernel's own oracle tolerance, not exact."""
    model, cfg, batch, state0 = _setup(window_size=7)
    mesh = _mesh()

    step_ref = make_train_step(model, cfg, donate=False)
    s_ref, m_ref = step_ref(state0, batch)

    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("dp")))
        for k, v in batch.items()
    }
    step_dp = make_train_step_dp(model, cfg, mesh, donate=False,
                                 core_kernel=True)
    s_dp, m_dp = step_dp(state0, sharded)

    assert np.isclose(float(m_ref["loss/total"]), float(m_dp["loss/total"]),
                      atol=1e-4)
    _assert_states_match(s_ref, s_dp, atol=5e-5)


def test_dp_step_second_step_diverges_from_zero_lr():
    """Sanity: the DP step actually trains (params move) and metrics are
    finite across two donated steps."""
    model, cfg, batch, state0 = _setup()
    mesh = _mesh()
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("dp")))
        for k, v in batch.items()
    }
    step_dp = make_train_step_dp(model, cfg, mesh, donate=True,
                                 core_kernel=False)
    p0 = jax.tree_util.tree_map(np.asarray, state0.params)
    state, m0 = step_dp(state0, sharded)
    state, m1 = step_dp(state, sharded)
    assert np.isfinite(float(m1["loss/total"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        p0, state.params,
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
