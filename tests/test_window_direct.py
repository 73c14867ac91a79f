import jax.numpy as jnp
import numpy as np

from mmrp_tpu.ops import window_attention as W


def test_direct_matches_padded_headmajor(rng):
    """The un-padded direct formulation must equal the padded head-major
    path (which equals the Pallas kernel, tested elsewhere)."""
    B, H, Wd, heads, dim, ws, shift = 2, 14, 14, 2, 32, 7, 3
    N, n_pad = 49, 64
    nW = 4
    head_dim = dim // heads
    scale = head_dim**-0.5

    qkv_win = jnp.asarray(
        rng.standard_normal((B, nW, N, 3, heads, head_dim)), jnp.float32
    )
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, heads)), jnp.float32)

    # direct path
    rel = W.build_rel_bias(table, ws)
    smask = jnp.asarray(W.shift_attn_mask(H, Wd, ws, shift))
    direct = W.window_attention_xla_direct(qkv_win, rel, smask, scale)

    # padded head-major path
    bias2 = W.build_combined_bias(table, ws, H, Wd, shift, n_pad)
    winp = jnp.pad(
        qkv_win.reshape(B, nW, N, 3 * dim), ((0, 0), (0, 0), (0, n_pad - N), (0, 0))
    )
    winp = winp.reshape(B, nW, n_pad, 3, heads, head_dim).transpose(3, 0, 4, 1, 2, 5)
    G = heads * nW
    q = winp[0].reshape(B, G, n_pad, head_dim)
    k = winp[1].reshape(B, G, n_pad, head_dim)
    v = winp[2].reshape(B, G, n_pad, head_dim)
    padded = W.window_attention_xla(q, k, v, bias2, scale)
    padded = padded.reshape(B, heads, nW, n_pad, head_dim)
    padded = padded.transpose(0, 2, 3, 1, 4).reshape(B, nW, n_pad, dim)[:, :, :N, :]

    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(padded), atol=2e-4
    )


def test_direct_no_shift(rng):
    B, heads, head_dim, ws = 1, 3, 8, 7
    N, nW = 49, 1
    qkv_win = jnp.asarray(
        rng.standard_normal((B, nW, N, 3, heads, head_dim)), jnp.float32
    )
    table = jnp.zeros(((2 * ws - 1) ** 2, heads), jnp.float32)
    out = W.window_attention_xla_direct(qkv_win, W.build_rel_bias(table, ws),
                                        None, head_dim**-0.5)
    assert out.shape == (B, nW, N, heads * head_dim)
    assert np.isfinite(np.asarray(out)).all()
