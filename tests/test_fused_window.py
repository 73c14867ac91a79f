import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.ops import window_attention as W
from mmrp_tpu.ops.fused_window_attention import (
    build_bias_full,
    fused_window_attention_windows,
)


def _ln(x, s, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _ref_unfused(x_raw, qkv_k, qkv_b, proj_k, proj_b, table, ws, heads, shift,
                 H, Wd, ln_s, ln_b):
    N = ws * ws
    nW = (H // ws) * (Wd // ws)
    d = x_raw.shape[-1] // heads
    x = _ln(x_raw, ln_s, ln_b)
    if shift:
        x = jnp.roll(x, (-shift, -shift), (1, 2))
    qkv = x @ qkv_k + qkv_b
    win = W.window_partition(qkv, ws).reshape(x.shape[0], nW, N, 3, heads, d)
    rel = W.build_rel_bias(table, ws)
    smask = jnp.asarray(W.shift_attn_mask(H, Wd, ws, shift)) if shift > 0 else None
    out = W.window_attention_xla_direct(win, rel, smask, d**-0.5,
                                        scores_dtype=jnp.float32)
    out = W.window_reverse(out, ws, H, Wd)
    out = out @ proj_k + proj_b
    if shift:
        out = jnp.roll(out, (shift, shift), (1, 2))
    return x_raw + out  # kernel includes the residual


def test_fused_matches_unfused(rng):
    B, H, Wd, C, heads, ws = 2, 14, 14, 32, 2, 7
    x = jnp.asarray(rng.standard_normal((B, H, Wd, C)) * 0.5, jnp.float32)
    qkv_k = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1, jnp.float32)
    qkv_b = jnp.asarray(rng.standard_normal(3 * C) * 0.1, jnp.float32)
    proj_k = jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32)
    proj_b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, heads)), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)

    for shift in (0, 3):
        bias_full = build_bias_full(table, ws, H, Wd, shift)
        # caller pre-rolls for the fused path
        x_in = jnp.roll(x, (-shift, -shift), (1, 2)) if shift else x
        xw = W.window_partition(x_in, ws)
        got = fused_window_attention_windows(
            xw, ln_s, ln_b, qkv_k, qkv_b, proj_k, proj_b, bias_full, heads,
            interpret=True,
        )
        got = W.window_reverse(got, ws, H, Wd)
        if shift:
            got = jnp.roll(got, (shift, shift), (1, 2))
        want = _ref_unfused(x, qkv_k, qkv_b, proj_k, proj_b, table, ws, heads,
                            shift, H, Wd, ln_s, ln_b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_fused_block_windows_fallback(rng):
    # nW=4 not divisible by default block 8 -> wblk falls back to 1
    B, H, Wd, C, heads, ws = 1, 14, 14, 16, 2, 7
    x = jnp.asarray(rng.standard_normal((B, H, Wd, C)), jnp.float32)
    table = jnp.zeros(((2 * ws - 1) ** 2, heads), jnp.float32)
    xw = W.window_partition(x, ws)
    out = fused_window_attention_windows(
        xw, jnp.ones(C), jnp.zeros(C),
        jnp.eye(C, 3 * C), jnp.zeros(3 * C), jnp.eye(C), jnp.zeros(C),
        build_bias_full(table, ws, H, Wd, 0), heads, block_windows=8,
        interpret=True,
    )
    assert out.shape == xw.shape
    assert np.isfinite(np.asarray(out)).all()


def test_bias_full_shapes():
    table = jnp.zeros((169, 3), jnp.float32)
    b0 = build_bias_full(table, 7, 14, 14, 0)
    assert b0.shape == (4, 3, 49, 49)
    b3 = build_bias_full(table, 7, 14, 14, 3)
    assert b3.shape == (4, 3, 49, 49)
    assert (np.asarray(b3) < -1e8).any()  # shift mask folded in


def test_swin_fused_param_layout_matches_unfused(rng):
    """Checkpoint compatibility: the fused path must expose the same param
    tree (qkv/proj kernel+bias) as the unfused path."""
    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

    x = jnp.asarray(rng.random((1, 28, 28, 3)), jnp.float32)
    cfgs = [SwinConfig.micro(use_pallas=False), SwinConfig.micro(use_pallas=True)]
    trees = []
    for cfg in cfgs:
        params = SwinEncoder(cfg).init(jax.random.PRNGKey(0), x)["params"]
        trees.append(jax.tree_util.tree_structure(params))
    assert trees[0] == trees[1]


def test_xla_6d_matches_direct():
    """The no-copy 6D formulation == partition + direct + reverse, both
    unshifted and shifted (stage-3-like 14x14/ws7 geometry)."""
    ws, h, d = 7, 2, 8
    H = Wd = 14
    B, C = 2, h * d
    r = np.random.default_rng(0)
    qkv = jnp.asarray(r.standard_normal((B, H, Wd, 3 * C)).astype(np.float32))
    table = jnp.asarray(r.standard_normal(((2 * ws - 1) ** 2, h)).astype(np.float32) * 0.1)
    rel = W.build_rel_bias(table, ws)
    scale = d**-0.5
    nW = (H // ws) * (Wd // ws)
    for shift in (0, 3):
        smask = jnp.asarray(W.shift_attn_mask(H, Wd, ws, shift)) if shift else None
        win = W.window_partition(qkv, ws)
        winq = win.reshape(B, nW, ws * ws, 3, h, d)
        want = W.window_reverse(
            W.window_attention_xla_direct(winq, rel, smask, scale), ws, H, Wd)
        qkv6 = qkv.reshape(B, H // ws, ws, Wd // ws, ws, 3, h, d)
        got = W.window_attention_xla_6d(qkv6, rel, smask, scale, ws)
        got = got.reshape(B, H, Wd, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_swinblock_xla_6d_env_matches_default(monkeypatch):
    """SwinBlock XLA path with MMRP_SWIN_XLA_6D=1 == the default path."""
    from mmrp_tpu.models.swin import SwinBlock

    B, H, Wd, C, h = 2, 14, 14, 32, 4
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((B, H, Wd, C)).astype(np.float32))
    blk = SwinBlock(dim=C, num_heads=h, window_size=7, shift=3,
                    input_resolution=(H, Wd), mlp_ratio=2.0, drop_path=0.0,
                    dropout=0.0, use_pallas=False)
    params = blk.init(jax.random.PRNGKey(0), x)
    want = blk.apply(params, x)
    monkeypatch.setenv("MMRP_SWIN_XLA_6D", "1")
    got = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_swinblock_preqkv_env_matches_default(monkeypatch):
    """Partition-before-qkv order is bit-identical to qkv-before-partition
    (the GEMM is per-token; window partition is a token permutation)."""
    from mmrp_tpu.models.swin import SwinBlock

    B, H, Wd, C, h = 2, 14, 14, 32, 4
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((B, H, Wd, C)).astype(np.float32))
    blk = SwinBlock(dim=C, num_heads=h, window_size=7, shift=3,
                    input_resolution=(H, Wd), mlp_ratio=2.0, drop_path=0.0,
                    dropout=0.0, use_pallas=False)
    params = blk.init(jax.random.PRNGKey(0), x)
    want = blk.apply(params, x)
    monkeypatch.setenv("MMRP_SWIN_XLA_PREQKV", "1")
    got = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)
