"""Fused sequence-attention kernel vs an independent reference computation.

Mirrors tests/test_fused_window.py's strategy: the Pallas kernel (interpret
mode on CPU — the exact production code path) must match (a) the module's
own xla_equivalent and (b) an independently written einsum reference, and
its custom VJP must match autodiff through the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.ops.fused_attention import fused_attention, xla_equivalent


def _params(rng, C):
    def w():
        return jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)

    def b():
        return jnp.asarray(rng.standard_normal((C,)) * 0.01, jnp.float32)

    return dict(
        ln_scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32),
        wq=w(), bq=b(), wk=w(), bk=b(), wv=w(), bv=b(), wo=w(), bo=b(),
    )


def _independent_reference(x, kv, key_mask, p, num_heads, ln_mode,
                           include_residual, eps=1e-6):
    """Plain numpy-style reference written without reusing kernel helpers."""
    x64 = np.asarray(x, np.float64)
    src = np.asarray(kv if kv is not None else x, np.float64)

    def ln(t):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return ((t - mu) / np.sqrt(var + eps) * np.asarray(p["ln_scale"])
                + np.asarray(p["ln_bias"]))

    qin = ln(x64) if ln_mode == "pre" else x64
    kin = ln(src) if (ln_mode == "pre" and kv is not None) else (
        qin if kv is None else src)
    q = qin @ np.asarray(p["wq"], np.float64) + np.asarray(p["bq"])
    k = kin @ np.asarray(p["wk"], np.float64) + np.asarray(p["bk"])
    v = kin @ np.asarray(p["wv"], np.float64) + np.asarray(p["bv"])
    B, Nq, C = x64.shape
    Nk = k.shape[1]
    h = num_heads
    d = C // h
    out = np.zeros((B, Nq, C))
    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        s = np.einsum("bqd,bkd->bqk", q[..., sl], k[..., sl]) / np.sqrt(d)
        if key_mask is not None:
            s = s + np.asarray(key_mask, np.float64)[:, None, :]
        s = s - s.max(-1, keepdims=True)
        e = np.exp(s)
        a = e / e.sum(-1, keepdims=True)
        out[..., sl] = np.einsum("bqk,bkd->bqd", a, v[..., sl])
    proj = out @ np.asarray(p["wo"], np.float64) + np.asarray(p["bo"])
    if ln_mode == "post":
        y = x64 + proj
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return ((y - mu) / np.sqrt(var + eps) * np.asarray(p["ln_scale"])
                + np.asarray(p["ln_bias"]))
    if include_residual:
        return x64 + proj
    return proj


CASES = [
    # (ln_mode, include_residual, cross, masked, B, Nq, Nk, C, h)
    ("post", True, False, True, 4, 16, 16, 64, 4),    # BERT layer form
    ("pre", True, False, False, 4, 16, 16, 64, 4),    # fusion self-attn form
    ("none", False, True, True, 4, 8, 16, 64, 4),     # fusion cross-attn form
    ("pre", False, False, True, 2, 24, 24, 128, 8),   # enhancer form
]


@pytest.mark.parametrize("ln_mode,res,cross,masked,B,Nq,Nk,C,h", CASES)
def test_kernel_matches_reference(ln_mode, res, cross, masked, B, Nq, Nk, C, h):
    rng = np.random.default_rng(0)
    p = _params(rng, C)
    x = jnp.asarray(rng.standard_normal((B, Nq, C)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, Nk, C)), jnp.float32) if cross else None
    mask = None
    if masked:
        valid = rng.integers(0, 2, (B, Nk)).astype(np.float32)
        valid[:, 0] = 1.0
        mask = jnp.asarray(np.where(valid > 0, 0.0, -1e9), jnp.float32)

    args = (x, p["ln_scale"], p["ln_bias"], p["wq"], p["bq"], p["wk"],
            p["bk"], p["wv"], p["bv"], p["wo"], p["bo"])
    got = fused_attention(*args, kv=kv, key_mask=mask, num_heads=h,
                          ln_mode=ln_mode, include_residual=res,
                          img_block=2, interpret=True)
    ref = _independent_reference(x, kv, mask, p, h, ln_mode, res)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    oracle = xla_equivalent(x, kv, mask, p["ln_scale"], p["ln_bias"],
                            p["wq"], p["bq"], p["wk"], p["bk"], p["wv"],
                            p["bv"], p["wo"], p["bo"], num_heads=h,
                            ln_mode=ln_mode, include_residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


def test_enhancer_form_pos_alpha_raw_residual():
    """out = x + alpha * proj(attn(LN(x + pos))) — the PreFusionEnhancer."""
    rng = np.random.default_rng(3)
    B, N, C, h = 4, 16, 64, 4
    p = _params(rng, C)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((N, C)) * 0.02, jnp.float32)
    alpha = jnp.asarray(0.37, jnp.float32)

    got = fused_attention(
        x, p["ln_scale"], p["ln_bias"], p["wq"], p["bq"], p["wk"], p["bk"],
        p["wv"], p["bv"], p["wo"], p["bo"], pos=pos, alpha=alpha,
        num_heads=h, ln_mode="pre", include_residual=True,
        residual_from_raw=True, img_block=2, interpret=True)

    base = x + pos[None]
    branch = _independent_reference(base, None, None, p, h, "pre", False)
    ref = np.asarray(x, np.float64) + 0.37 * branch
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    oracle = xla_equivalent(
        x, None, None, p["ln_scale"], p["ln_bias"], p["wq"], p["bq"],
        p["wk"], p["bk"], p["wv"], p["bv"], p["wo"], p["bo"], num_heads=h,
        ln_mode="pre", include_residual=True, pos=pos, alpha=alpha,
        residual_from_raw=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla_path():
    rng = np.random.default_rng(1)
    B, N, C, h = 2, 16, 64, 4
    p = _params(rng, C)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    def loss_fused(x_, wq, wo):
        y = fused_attention(x_, p["ln_scale"], p["ln_bias"], wq, p["bq"],
                            p["wk"], p["bk"], p["wv"], p["bv"], wo, p["bo"],
                            num_heads=h, ln_mode="post", interpret=True,
                            img_block=2)
        return (y ** 2).sum()

    def loss_xla(x_, wq, wo):
        y = xla_equivalent(x_, None, None, p["ln_scale"], p["ln_bias"], wq,
                           p["bq"], p["wk"], p["bk"], p["wv"], p["bv"], wo,
                           p["bo"], num_heads=h, ln_mode="post")
        return (y ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, p["wq"], p["wo"])
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, p["wq"], p["wo"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_dtype_and_odd_batch_block():
    rng = np.random.default_rng(2)
    B, N, C, h = 3, 8, 64, 2   # B=3 forces img_block fallback to 1
    p = _params(rng, C)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    y = fused_attention(x, p["ln_scale"], p["ln_bias"], p["wq"], p["bq"],
                        p["wk"], p["bk"], p["wv"], p["bv"], p["wo"], p["bo"],
                        num_heads=h, ln_mode="pre", img_block=8,
                        interpret=True)
    assert y.dtype == jnp.bfloat16 and y.shape == (B, N, C)
    ref = _independent_reference(x.astype(jnp.float32), None, None, p, h,
                                 "pre", True)
    np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                               rtol=0.1, atol=0.1)
