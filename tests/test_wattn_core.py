"""Raw-layout window-attention core (ops/wattn_core.py) vs the composed
XLA oracle: forward AND gradients (hand-written backward kernel), with and
without the cyclic shift, at bb>1 block shapes, plus the MMRP_SWIN_CORE
model-level gate."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.ops.fused_window_attention import build_bias_full
from mmrp_tpu.ops.wattn_core import window_attention_core
from mmrp_tpu.ops.window_attention import (
    window_attention_xla_direct,
    window_partition,
    window_reverse,
)


def _oracle(qkv, bias, ws, shift, num_heads, scale):
    """The models/swin.py XLA composition: roll -> partition -> attention
    (with the SAME combined (nW, h, N, N) bias) -> reverse -> unroll."""
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    N = ws * ws
    nW = (H // ws) * (W // ws)
    x = jnp.roll(qkv, (-shift, -shift), axis=(1, 2)) if shift else qkv
    win = window_partition(x, ws)  # (B, nW, N, 3C)
    winq = win.reshape(B, nW, N, 3, num_heads, d)
    q = winq[..., 0, :, :]
    k = winq[..., 1, :, :]
    v = winq[..., 2, :, :]
    scores = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale + bias[None]  # (nW, h, N, N) broadcast over B
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32))
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", p, v).reshape(B, nW, N, C)
    out = window_reverse(out, ws, H, W)
    return jnp.roll(out, (shift, shift), axis=(1, 2)) if shift else out


@pytest.mark.parametrize("shift", [0, 3])
@pytest.mark.parametrize("B", [1, 2])
def test_core_forward_matches_oracle(rng, shift, B):
    ws, H, W, heads, d = 7, 14, 14, 2, 8
    C = heads * d
    scale = d**-0.5
    qkv = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), jnp.float32)
    table = jnp.asarray(
        rng.standard_normal(((2 * ws - 1) ** 2, heads)) * 0.1, jnp.float32)
    bias = build_bias_full(table, ws, H, W, shift)

    got = window_attention_core(qkv, bias, ws=ws, shift=shift,
                                num_heads=heads, scale=scale, interpret=True)
    want = _oracle(qkv, bias, ws, shift, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("shift", [0, 3])
def test_core_gradients_match_oracle(rng, shift):
    """jax.grad through the custom VJP (hand-written backward kernel) must
    equal autodiff through the XLA composition — for qkv AND the bias."""
    ws, H, W, heads, d, B = 7, 14, 14, 2, 8, 2
    C = heads * d
    scale = d**-0.5
    qkv = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), jnp.float32)
    table = jnp.asarray(
        rng.standard_normal(((2 * ws - 1) ** 2, heads)) * 0.1, jnp.float32)
    bias = build_bias_full(table, ws, H, W, shift)
    cot = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    def loss_core(qkv, bias):
        out = window_attention_core(qkv, bias, ws=ws, shift=shift,
                                    num_heads=heads, scale=scale,
                                    interpret=True)
        return jnp.sum(out * cot)

    def loss_oracle(qkv, bias):
        return jnp.sum(_oracle(qkv, bias, ws, shift, heads, scale) * cot)

    g_core = jax.grad(loss_core, argnums=(0, 1))(qkv, bias)
    g_want = jax.grad(loss_oracle, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_core[0]), np.asarray(g_want[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_core[1]), np.asarray(g_want[1]),
                               atol=3e-5)


@pytest.mark.parametrize("shift", [0, 3])
def test_core_unaligned_lane_pad(rng, shift):
    """Swin-T stage-1 dims (C=96, heads=3, 3C=288 — NOT a 128 multiple):
    the kernel's _pad_lanes path must reproduce the oracle's forward and
    gradients exactly (pad lanes are never read / sliced off on merge)."""
    ws, H, W, heads, d, B = 7, 14, 14, 3, 32, 2
    C = heads * d
    scale = d**-0.5
    qkv = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), jnp.float32)
    table = jnp.asarray(
        rng.standard_normal(((2 * ws - 1) ** 2, heads)) * 0.1, jnp.float32)
    bias = build_bias_full(table, ws, H, W, shift)
    cot = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    def loss_core(qkv, bias):
        out = window_attention_core(qkv, bias, ws=ws, shift=shift,
                                    num_heads=heads, scale=scale,
                                    interpret=True)
        return jnp.sum(out * cot)

    def loss_oracle(qkv, bias):
        return jnp.sum(_oracle(qkv, bias, ws, shift, heads, scale) * cot)

    np.testing.assert_allclose(
        np.asarray(window_attention_core(
            qkv, bias, ws=ws, shift=shift, num_heads=heads, scale=scale,
            interpret=True)),
        np.asarray(_oracle(qkv, bias, ws, shift, heads, scale)), atol=2e-5)
    g_core = jax.grad(loss_core, argnums=(0, 1))(qkv, bias)
    g_want = jax.grad(loss_oracle, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_core[0]), np.asarray(g_want[0]),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(g_core[1]), np.asarray(g_want[1]),
                               atol=5e-5)


def test_core_multiblock_grid(rng):
    """B larger than the VMEM block: grid > 1, dbias accumulates across
    sequential grid steps."""
    ws, H, W, heads, d, shift = 7, 14, 14, 2, 8, 3
    C = heads * d
    scale = d**-0.5
    B = 4
    qkv = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), jnp.float32)
    table = jnp.asarray(
        rng.standard_normal(((2 * ws - 1) ** 2, heads)) * 0.1, jnp.float32)
    bias = build_bias_full(table, ws, H, W, shift)
    cot = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    # force multiple grid steps by shrinking the block cap
    import mmrp_tpu.ops.wattn_core as wc

    orig = wc._pick_block_b
    wc._pick_block_b = functools.partial(orig, cap_bytes=H * W * 3 * C * 4)
    wc._make_core.cache_clear()
    try:
        def loss(qkv, bias):
            out = window_attention_core(qkv, bias, ws=ws, shift=shift,
                                        num_heads=heads, scale=scale,
                                        interpret=True)
            return jnp.sum(out * cot)

        g = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    finally:
        wc._pick_block_b = orig
        wc._make_core.cache_clear()

    def loss_oracle(qkv, bias):
        return jnp.sum(_oracle(qkv, bias, ws, shift, heads, scale) * cot)

    g_want = jax.grad(loss_oracle, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_want[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_want[1]),
                               atol=3e-5)


def test_swin_gate_numerics_and_grads(rng, monkeypatch):
    """MMRP_SWIN_CORE=1 routes WindowAttention through the core op with
    identical outputs and parameter gradients (incl. the rel-bias table
    through build_bias_full's broadcast chain)."""
    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

    cfg = SwinConfig(img_size=28, patch_size=2, embed_dim=16,
                     depths=(2,), num_heads=(2,), window_size=7,
                     use_pallas=False, drop_path_rate=0.0)
    model = SwinEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(params, x):
        out = model.apply({"params": params}, x)
        return jnp.sum(out["patches"] ** 2) + jnp.sum(out["global"] ** 2)

    monkeypatch.delenv("MMRP_SWIN_CORE", raising=False)
    base = loss(params, x)
    gbase = jax.grad(loss)(params, x)

    monkeypatch.setenv("MMRP_SWIN_CORE", "1")
    got = loss(params, x)
    ggot = jax.grad(loss)(params, x)

    np.testing.assert_allclose(float(got), float(base), rtol=1e-5)
    flat_b = jax.tree_util.tree_leaves_with_path(gbase)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(ggot))
    for path, vb in flat_b:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), np.asarray(vb), atol=5e-4,
            err_msg=str(path))
