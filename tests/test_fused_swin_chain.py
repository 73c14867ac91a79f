"""Roll-chain kernel (ops/fused_swin_pair.py::fused_swin_block_chain):
oracle parity, static-int8 fidelity, encoder routing equivalence, VMEM
gate, and gradient correctness.

One block per program on the raw map, with the roll that prepares the
NEXT block's frame applied in-VMEM before the HBM write — consecutive
blocks chain custom-call -> custom-call with zero XLA relayout/roll ops
between (reference semantics: timm swin consumed via
/root/reference/src/Model/fusion.py:92; repo oracle models/swin.py::
SwinBlock whole-block path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.ops.fused_swin_block import build_bias_padded
from mmrp_tpu.ops.fused_swin_pair import (
    _xla_chain,
    chain_vmem_ok,
    fused_swin_block_chain,
)
from mmrp_tpu.ops.quant import quantize_weight


def _block(rng, C, hidden):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return (
        jnp.ones((C,), jnp.float32), mk(C) * 0.02,        # ln0
        mk(C, 3 * C) * 0.05, mk(3 * C) * 0.02,            # qkv
        mk(C, C) * 0.05, mk(C) * 0.02,                    # proj
        jnp.ones((C,), jnp.float32), mk(C) * 0.02,        # ln1
        mk(C, hidden) * 0.05, mk(hidden) * 0.02,          # mlp1
        mk(hidden, C) * 0.05, mk(C) * 0.02,               # mlp2
    )


def _geom(rng, C=256, H=28, heads=8, shift=0):
    ws = 7
    hidden = 4 * C
    b = _block(rng, C, hidden)
    rel = jnp.asarray(
        rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32))
    bias = build_bias_padded(rel, ws, H, H, shift)
    x = jnp.asarray(rng.standard_normal((2, H, H, C)).astype(np.float32))
    return x, b, bias, ws, heads


@pytest.mark.parametrize("roll_after", [0, -3, 3])
def test_chain_kernel_matches_oracle(roll_after):
    rng = np.random.default_rng(0)
    x, b, bias, ws, heads = _geom(rng)
    ref = _xla_chain(x, b, bias, num_heads=heads, eps=1e-6, ws=ws,
                     roll_after=roll_after)
    got = fused_swin_block_chain(x, b, bias, heads, ws, roll_after,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_chain_two_blocks_equal_pair_semantics():
    """Chaining block0(roll -s) then shifted block1(roll +s) must equal
    the sequential two-block execution (same composition the pair kernel
    implements)."""
    from mmrp_tpu.ops.fused_swin_pair import _xla_pair

    rng = np.random.default_rng(1)
    ws, heads, C, H = 7, 8, 256, 28
    s = ws // 2
    x, b0, bias0, _, _ = _geom(rng, C=C, H=H, heads=heads, shift=0)
    _, b1, bias1, _, _ = _geom(rng, C=C, H=H, heads=heads, shift=s)
    ref = _xla_pair(x, b0, bias0, b1, bias1, num_heads=heads, eps=1e-6,
                    ws=ws, shift=s)
    y = fused_swin_block_chain(x, b0, bias0, heads, ws, -s, interpret=True)
    got = fused_swin_block_chain(y, b1, bias1, heads, ws, s, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_chain_kernel_static_int8_fidelity():
    # Swin-B stage-2 geometry (C=512) — the stage this kernel targets
    rng = np.random.default_rng(2)
    x, b, bias, ws, heads = _geom(rng, C=512, H=14, heads=16, shift=3)
    ref = _xla_chain(x, b, bias, num_heads=heads, eps=1e-6, ws=ws,
                     roll_after=3)

    wq, scales = list(b), []
    for i in (2, 4, 8, 10):
        wqi, si = quantize_weight(b[i])
        wq[i] = wqi
        scales.append(si.reshape(-1))
    got = fused_swin_block_chain(
        x.astype(jnp.bfloat16),
        tuple(a.astype(jnp.bfloat16) if a.dtype == jnp.float32
              and i not in (0, 1, 6, 7) else a for i, a in enumerate(wq)),
        bias, heads, ws, 3,
        quant="static", wscales=tuple(scales), interpret=True)
    a = np.asarray(got, np.float32).reshape(2, -1)
    r = np.asarray(ref, np.float32).reshape(2, -1)
    cos = (a * r).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(r, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos


def test_chain_kernel_gradients_match_oracle():
    rng = np.random.default_rng(3)
    x, b, bias, ws, heads = _geom(rng, C=64, H=14, heads=4, shift=3)

    def loss_chain(x_):
        out = fused_swin_block_chain(x_, b, bias, heads, ws, -3,
                                     interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(x_):
        out = _xla_chain(x_, b, bias, num_heads=heads, eps=1e-6, ws=ws,
                         roll_after=-3)
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss_chain)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_chain_vmem_gate():
    # single-block residency: C=512 fits in BOTH precisions (the pair
    # needed int8 and still lost); C=1024 fits in neither
    assert chain_vmem_ok(256, 28, 28, 8, 7)
    assert chain_vmem_ok(512, 14, 14, 16, 7)
    assert chain_vmem_ok(512, 14, 14, 16, 7, weight_bytes=1)
    assert not chain_vmem_ok(1024, 7, 7, 32, 7)
    assert not chain_vmem_ok(1024, 7, 7, 32, 7, weight_bytes=1)


def test_encoder_chain_routing_matches_sequential(monkeypatch):
    """SwinEncoder with the chain default must equal the sequential
    whole-block path (identical params, identical tree)."""
    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    monkeypatch.setenv("MMRP_SWIN_PAIR", "0")   # isolate the chain
    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=256,
                     depths=(3,), num_heads=(8,), window_size=7,
                     drop_path_rate=0.0, dropout=0.0, use_pallas=True)
    model = SwinEncoder(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((2, 56, 56, 3), dtype=np.float32))

    monkeypatch.setenv("MMRP_SWIN_CHAIN", "0")
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    ref = model.apply({"params": params}, img)

    monkeypatch.setenv("MMRP_SWIN_CHAIN", "1")
    params2 = model.init(jax.random.PRNGKey(0), img)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)
    got = model.apply({"params": params}, img)

    np.testing.assert_allclose(np.asarray(got["global"]),
                               np.asarray(ref["global"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["patches"]),
                               np.asarray(ref["patches"]),
                               rtol=2e-4, atol=2e-4)


def test_encoder_chain_static_int8(monkeypatch):
    """int8_static + chain (the serving default mix) stays faithful to
    the float sequential path."""
    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    monkeypatch.setenv("MMRP_SWIN_PAIR", "0")
    monkeypatch.setenv("MMRP_SWIN_CHAIN", "1")
    base = dict(img_size=56, patch_size=4, embed_dim=256, depths=(2,),
                num_heads=(8,), window_size=7, drop_path_rate=0.0,
                dropout=0.0, use_pallas=True)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((2, 56, 56, 3), dtype=np.float32))

    ref_model = SwinEncoder(SwinConfig(**base), dtype=jnp.float32)
    params = ref_model.init(jax.random.PRNGKey(0), img)["params"]
    ref = ref_model.apply({"params": params}, img)

    q_model = SwinEncoder(
        SwinConfig(**base, quant="int8_static",
                   act_amax=((8.0, 8.0, 8.0, 8.0),) * 2),
        dtype=jnp.bfloat16)
    got = q_model.apply({"params": params}, img)
    a = np.asarray(got["global"], np.float32)
    r = np.asarray(ref["global"], np.float32)
    cos = (a * r).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(r, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos


def test_encoder_pair_plus_chain_combined(monkeypatch):
    """The serving arm measured on-chip (round-5 trio arm C): pair kernel
    at C=256 AND roll-chain at C=512 in the SAME encoder, static-int8 —
    both routings active at once must stay faithful to the float
    sequential path (two stages, 28->14 maps, a real patch-merge between)."""
    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    monkeypatch.setenv("MMRP_SWIN_PAIR", "1")
    monkeypatch.setenv("MMRP_SWIN_CHAIN", "1")
    base = dict(img_size=112, patch_size=4, embed_dim=256, depths=(2, 2),
                num_heads=(8, 16), window_size=7, drop_path_rate=0.0,
                dropout=0.0)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((1, 112, 112, 3), dtype=np.float32))

    ref_model = SwinEncoder(SwinConfig(**base, use_pallas=False),
                            dtype=jnp.float32)
    params = ref_model.init(jax.random.PRNGKey(0), img)["params"]
    ref = ref_model.apply({"params": params}, img)

    q_model = SwinEncoder(
        SwinConfig(**base, use_pallas=True, quant="int8_static",
                   act_amax=((8.0,) * 4,) * 4),
        dtype=jnp.bfloat16)
    got = q_model.apply({"params": params}, img)
    a = np.asarray(got["global"], np.float32)
    r = np.asarray(ref["global"], np.float32)
    cos = (a * r).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(r, axis=-1) + 1e-12)
    assert cos.min() > 0.995, cos
