"""Whole-Swin-block fused kernel (ops/fused_swin_block.py) correctness.

Oracle chain: Pallas kernel (interpret) == module xla_equivalent ==
SwinBlock's unfused XLA path, on shared parameter trees — covering the
in-VMEM window padding, pad-key masking, shift handling, and both stage
shapes (multi-window and single-window/stage-4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.models.swin import SwinBlock
from mmrp_tpu.ops.fused_swin_block import (
    build_bias_padded,
    fused_swin_block_windows,
    padded_tokens,
    xla_equivalent,
)
from mmrp_tpu.ops.window_attention import window_partition, window_reverse


def _params(rng, C, hidden, h, ws):
    r = np.random.default_rng(rng)

    def t(*s):
        return jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.05)

    return dict(
        rel=t((2 * ws - 1) ** 2, h),
        ln0_s=jnp.ones((C,)), ln0_b=t(C),
        qkv_k=t(C, 3 * C), qkv_b=t(3 * C),
        proj_k=t(C, C), proj_b=t(C),
        ln1_s=jnp.ones((C,)), ln1_b=t(C),
        w1=t(C, hidden), b1=t(hidden),
        w2=t(hidden, C), b2=t(C),
    )


@pytest.mark.parametrize("pad_gemm", [False, True])
@pytest.mark.parametrize("shape,h,shift", [
    ((2, 14, 14, 64), 4, 0),     # stage-3-like: 4 windows
    ((2, 14, 14, 64), 4, 3),     # shifted
    ((3, 7, 7, 32), 2, 0),       # stage-4-like: single window, ib>1
])
def test_kernel_matches_xla_equivalent(shape, h, shift, pad_gemm,
                                       monkeypatch):
    # pin the PADDED flavor: nopad is the default since the Swin-B A/B
    # (-5.7%), but the pad flavor stays selectable and must stay correct
    monkeypatch.setenv("MMRP_SWIN_NOPAD", "0")
    B, H, W, C = shape
    ws = 7
    p = _params(0, C, 2 * C, h, ws)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(shape).astype(np.float32))

    xs = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    xw = window_partition(xs, ws)
    bias = build_bias_padded(p["rel"], ws, H, W, shift)
    assert bias.shape[-1] == padded_tokens(ws)
    args = (xw, p["ln0_s"], p["ln0_b"], p["qkv_k"], p["qkv_b"],
            p["proj_k"], p["proj_b"], p["ln1_s"], p["ln1_b"],
            p["w1"], p["b1"], p["w2"], p["b2"], bias)
    got = fused_swin_block_windows(*args[:13], args[13], h,
                                   pad_gemm=pad_gemm, interpret=True)
    want = xla_equivalent(*args, num_heads=h)
    assert got.shape == xw.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shift", [0, 3])
def test_whole_block_path_matches_unfused_swinblock(shift):
    """SwinBlock with the whole-block kernel == SwinBlock's XLA path."""
    B, H, W, C, h = 2, 14, 14, 32, 4
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, H, W, C)).astype(np.float32))

    def build(use_pallas):
        return SwinBlock(dim=C, num_heads=h, window_size=7, shift=shift,
                         input_resolution=(H, W), mlp_ratio=2.0,
                         drop_path=0.0, dropout=0.0, use_pallas=use_pallas)

    ref_blk = build(False)
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    want = ref_blk.apply(params, x)

    os.environ["MMRP_FORCE_PALLAS"] = "1"
    os.environ["MMRP_SWIN_WHOLE"] = "1"
    try:
        got = build(True).apply(params, x)  # same tree, fused path
    finally:
        del os.environ["MMRP_FORCE_PALLAS"]
        del os.environ["MMRP_SWIN_WHOLE"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("shape,h,shift", [
    ((2, 14, 14, 64), 4, 0),     # stage-3-like: 4 windows
    ((2, 14, 14, 64), 4, 3),     # shifted
    ((3, 7, 7, 32), 2, 0),       # stage-4-like: single window, ib>1
])
def test_nopad_flavor_matches_xla_equivalent(shape, h, shift, monkeypatch):
    """MMRP_SWIN_NOPAD=1: unpadded large-M flavor (rows = ib*wblk*49, no
    56-token pad) must match the oracle exactly like the pad flavor."""
    monkeypatch.setenv("MMRP_SWIN_NOPAD", "1")
    B, H, W, C = shape
    ws = 7
    p = _params(0, C, 2 * C, h, ws)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(shape).astype(np.float32))
    xs = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    xw = window_partition(xs, ws)
    bias = build_bias_padded(p["rel"], ws, H, W, shift)
    args = (xw, p["ln0_s"], p["ln0_b"], p["qkv_k"], p["qkv_b"],
            p["proj_k"], p["proj_b"], p["ln1_s"], p["ln1_b"],
            p["w1"], p["b1"], p["w2"], p["b2"], bias)
    got = fused_swin_block_windows(*args[:13], args[13], h,
                                   pad_gemm=True, interpret=True)
    want = xla_equivalent(*args, num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_quantized_pad_flavor_close_to_float():
    """quant=True (W8A8 GEMMs in the pad-flavor kernel) stays close to the
    full-precision oracle."""
    B, H, W, C, h, ws = 2, 14, 14, 64, 4, 7
    p = _params(9, C, 2 * C, h, ws)
    x = jnp.asarray(
        np.random.default_rng(10).standard_normal((B, H, W, C)).astype(np.float32))
    xw = window_partition(x, ws)
    bias = build_bias_padded(p["rel"], ws, H, W, 0)
    args = (xw, p["ln0_s"], p["ln0_b"], p["qkv_k"], p["qkv_b"],
            p["proj_k"], p["proj_b"], p["ln1_s"], p["ln1_b"],
            p["w1"], p["b1"], p["w2"], p["b2"], bias)
    got = fused_swin_block_windows(*args[:13], bias, h, pad_gemm=True,
                                   quant=True, interpret=True)
    want = xla_equivalent(*args, num_heads=h)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 0.1, err


def test_single_window_reverse_roundtrip():
    B, H, W, C, h, ws = 1, 14, 14, 32, 4, 7
    p = _params(3, C, 2 * C, h, ws)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((B, H, W, C)).astype(np.float32))
    xw = window_partition(x, ws)
    bias = build_bias_padded(p["rel"], ws, H, W, 0)
    out = fused_swin_block_windows(
        xw, p["ln0_s"], p["ln0_b"], p["qkv_k"], p["qkv_b"],
        p["proj_k"], p["proj_b"], p["ln1_s"], p["ln1_b"],
        p["w1"], p["b1"], p["w2"], p["b2"], bias, h, interpret=True)
    rev = window_reverse(out, ws, H, W)
    assert rev.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(rev)).all()


def test_kernel_gradients_finite():
    B, H, W, C, h, ws = 1, 14, 14, 32, 2, 7
    p = _params(5, C, 2 * C, h, ws)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((B, H, W, C)).astype(np.float32))
    xw = window_partition(x, ws)
    bias = build_bias_padded(p["rel"], ws, H, W, 0)

    def loss(xw_, qkv_k, w1):
        o = fused_swin_block_windows(
            xw_, p["ln0_s"], p["ln0_b"], qkv_k, p["qkv_b"],
            p["proj_k"], p["proj_b"], p["ln1_s"], p["ln1_b"],
            w1, p["b1"], p["w2"], p["b2"], bias, h, interpret=True)
        return (o ** 2).mean()

    g = jax.grad(loss, argnums=(0, 1, 2))(xw, p["qkv_k"], p["w1"])
    for t in g:
        assert np.isfinite(np.asarray(t)).all()


@pytest.mark.parametrize("shape,h,shift,ib", [
    ((2, 14, 14, 64), 4, 0, None),   # stage-3-like: 2x1 window rows
    ((2, 14, 14, 64), 4, 3, None),   # shifted
    ((3, 7, 7, 32), 2, 0, None),     # stage-4-like: single window, ib>1
    ((4, 28, 28, 32), 2, 2, 2),      # stage-2-like: 4 window rows, ib=2
])
def test_raw_flavor_matches_xla_equivalent(shape, h, shift, ib):
    """fused_swin_block_raw on the UN-PARTITIONED map == partition +
    oracle + reverse, across stage geometries and shifts."""
    from mmrp_tpu.ops.fused_swin_block import fused_swin_block_raw

    B, H, W, C = shape
    ws = 7
    p = _params(0, C, 2 * C, h, ws)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(shape).astype(np.float32))
    xs = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    bias = build_bias_padded(p["rel"], ws, H, W, shift)
    args = (p["ln0_s"], p["ln0_b"], p["qkv_k"], p["qkv_b"],
            p["proj_k"], p["proj_b"], p["ln1_s"], p["ln1_b"],
            p["w1"], p["b1"], p["w2"], p["b2"])
    got = fused_swin_block_raw(xs, *args, bias, h, ws, image_block=ib,
                               interpret=True)
    xw = window_partition(xs, ws)
    want = window_reverse(
        xla_equivalent(xw, *args, bias, num_heads=h), ws, H, W)
    assert got.shape == xs.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_raw_flavor_grad_matches_oracle():
    """Custom VJP of the raw flavor == autodiff through the oracle chain."""
    from mmrp_tpu.ops.fused_swin_block import fused_swin_block_raw

    B, H, W, C, h, ws = 2, 14, 14, 32, 4, 7
    p = _params(2, C, 2 * C, h, ws)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, H, W, C)).astype(np.float32))
    bias = build_bias_padded(p["rel"], ws, H, W, 0)
    args = (p["ln0_s"], p["ln0_b"], p["qkv_k"], p["qkv_b"],
            p["proj_k"], p["proj_b"], p["ln1_s"], p["ln1_b"],
            p["w1"], p["b1"], p["w2"], p["b2"])

    def f_raw(x_):
        return fused_swin_block_raw(x_, *args, bias, h, ws,
                                    interpret=True).sum()

    def f_ref(x_):
        xw = window_partition(x_, ws)
        return window_reverse(
            xla_equivalent(xw, *args, bias, num_heads=h), ws, H, W).sum()

    g_raw = jax.grad(f_raw)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_raw), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_swinblock_raw_env_matches_default(monkeypatch):
    """SwinBlock whole-block route with MMRP_SWIN_RAW=1 == default route."""
    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    monkeypatch.setenv("MMRP_SWIN_WHOLE", "1")
    monkeypatch.setenv("MMRP_SWIN_WHOLE_MINC", "32")
    B, H, W, C, h = 2, 14, 14, 32, 4
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, H, W, C)).astype(np.float32))
    blk = SwinBlock(dim=C, num_heads=h, window_size=7, shift=3,
                    input_resolution=(H, W), mlp_ratio=2.0, drop_path=0.0,
                    dropout=0.0, use_pallas=True)
    params = blk.init(jax.random.PRNGKey(0), x)
    want = blk.apply(params, x)
    monkeypatch.setenv("MMRP_SWIN_RAW", "1")
    got = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
