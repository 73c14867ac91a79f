"""Gradient correctness of the fused Pallas kernels (custom VJPs).

The VJPs recompute through the pure-XLA equivalents, so gradients through
the fused ops must match gradients of those equivalents exactly (same math,
same dtype discipline). On CPU the kernels run in interpret mode — the same
production code path the TPU takes, minus Mosaic compilation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmrp_tpu.ops import fused_mlp as FM
from mmrp_tpu.ops import fused_window_attention as FW


def _wattn_inputs(rng, B=2, nW=4, N=49, C=32, h=4):
    xw = jnp.asarray(rng.standard_normal((B, nW, N, C)).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((nW, h, N, N)).astype(np.float32) * 0.2)
    return xw, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias


@pytest.mark.parametrize("include_residual", [True, False])
def test_fused_window_attention_grads_match_xla(rng, include_residual):
    args = _wattn_inputs(rng)
    h = 4

    def loss_fused(*a):
        out = FW.fused_window_attention_windows(
            *a, num_heads=h, interpret=True,
            include_residual=include_residual,
        )
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_xla(*a):
        out = FW.xla_equivalent(
            *a, num_heads=h, include_residual=include_residual
        )
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    # primal agreement (cos-weighted sum cancels heavily -> loose rtol)
    np.testing.assert_allclose(
        loss_fused(*args), loss_xla(*args), rtol=1e-3, atol=1e-5
    )
    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(8)))(*args)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(gf, gx, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("post_ln", [False, True])
@pytest.mark.parametrize("include_residual", [True, False])
def test_fused_mlp_grads_match_xla(rng, post_ln, include_residual):
    if post_ln and not include_residual:
        pytest.skip("post-LN form always includes the residual")
    M, C, Hd = 64, 32, 128
    x = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, Hd)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(Hd).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((Hd, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    args = (x, ln_s, ln_b, w1, b1, w2, b2)

    def loss_fused(*a):
        out = FM.fused_ln_mlp_residual(
            *a, post_ln=post_ln, interpret=True,
            include_residual=include_residual,
        )
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

    def loss_xla(*a):
        out = FM.xla_equivalent(
            *a, post_ln=post_ln, include_residual=include_residual
        )
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

    # the scalar loss is a sin-weighted sum that cancels to ~1e-2 from
    # O(1) terms, so benign interpret-vs-XLA accumulation-order diffs
    # (~1e-6 elementwise) amplify; compare at the same tolerance as the
    # gradients rather than asserting cancellation luck
    np.testing.assert_allclose(loss_fused(*args), loss_xla(*args), rtol=2e-4)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(gf, gx, rtol=2e-4, atol=2e-5)


def test_swin_training_step_takes_fused_path(rng, monkeypatch):
    """Model-level: grads through the fused (forced-interpret) path match
    the unfused XLA path on identical params — training now runs the
    production kernels."""
    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

    base = dict(
        img_size=28, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=7, drop_path_rate=0.0, dropout=0.0,
    )
    x = jnp.asarray(rng.standard_normal((2, 28, 28, 3)).astype(np.float32))
    enc_fused = SwinEncoder(SwinConfig(use_pallas=True, **base))
    enc_xla = SwinEncoder(SwinConfig(use_pallas=False, **base))
    params = enc_xla.init(jax.random.PRNGKey(0), x)

    def loss(enc):
        def f(p):
            out = enc.apply(p, x, deterministic=False)
            return jnp.sum(out["global"] ** 2) + jnp.mean(out["patches"])
        return f

    lf, gf = jax.value_and_grad(loss(enc_fused))(params)
    lx, gx = jax.value_and_grad(loss(enc_xla))(params)
    np.testing.assert_allclose(lf, lx, rtol=1e-4)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_x = jax.tree_util.tree_leaves(gx)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)
