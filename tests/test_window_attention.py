import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.ops import window_attention as W


def test_partition_reverse_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 14, 14, 8)), jnp.float32)
    win = W.window_partition(x, 7)
    assert win.shape == (2, 4, 49, 8)
    back = W.window_reverse(win, 7, 14, 14)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = W.relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    # diagonal = center offset, all equal
    assert len(set(np.diag(idx).tolist())) == 1
    # symmetric offsets map to transposed indices table-consistently
    assert idx[0, 48] != idx[48, 0]


def test_shift_mask_blocks_cross_region():
    m = W.shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    # unshifted top-left window has no masking
    np.testing.assert_array_equal(m[0], np.zeros((49, 49)))
    # bottom-right window mixes regions -> some -1e9 entries
    assert (m[-1] < -1e8).any()
    # mask symmetric
    np.testing.assert_array_equal(m[-1], np.transpose(m[-1], (1, 0)))


def _setup(rng, B=2, H=14, Wd=14, heads=2, dim=32, shift=0):
    ws = 7
    N, n_pad = 49, 64
    nW = (H // ws) * (Wd // ws)
    head_dim = dim // heads
    G = heads * nW
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, G, n_pad, head_dim)), jnp.float32)
        for _ in range(3)
    )
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, heads)), jnp.float32)
    bias2 = W.build_combined_bias(table, ws, H, Wd, shift, n_pad)
    assert bias2.shape == (G, n_pad, n_pad)
    return q, k, v, bias2, head_dim**-0.5


def test_xla_attention_is_softmax_attention(rng):
    q, k, v, bias2, scale = _setup(rng, B=1, heads=1)
    out = W.window_attention_xla(q, k, v, bias2, scale)
    # manual reference for one (b, g)
    s = np.asarray(q[0, 0] @ k[0, 0].T) * scale + np.asarray(bias2[0])
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expect = p @ np.asarray(v[0, 0])
    np.testing.assert_allclose(np.asarray(out[0, 0]), expect, atol=1e-4)


def test_pallas_matches_xla(rng):
    q, k, v, bias2, scale = _setup(rng, B=2, heads=2, shift=3)
    ref = W.window_attention_xla(q, k, v, bias2, scale)
    got = W.window_attention_pallas(q, k, v, bias2, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_pallas_blockg_fallback(rng):
    # G not divisible by 8 -> block_g falls back to 1
    q, k, v, bias2, scale = _setup(rng, heads=3)  # G = 3*4 = 12
    ref = W.window_attention_xla(q, k, v, bias2, scale)
    got = W.window_attention_pallas(q, k, v, bias2, scale, block_g=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_padding_columns_get_no_attention(rng):
    q, k, v, bias2, scale = _setup(rng, B=1, heads=1)
    # huge values in padded key rows must not leak into outputs
    v = v.at[:, :, 49:, :].set(1e6)
    out = W.window_attention_xla(q, k, v, bias2, scale)
    assert np.abs(np.asarray(out[:, :, :49, :])).max() < 1e3
