"""W8A8 dynamic quantization: numeric guarantees for the serving path."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.ops.quant import quant_dot, quantize_acts, quantize_weight


def test_weight_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (1, 128)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) - np.asarray(w))
    # symmetric uniform quantization: |err| <= scale/2 per channel
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_act_scales_per_row():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8, 32)), jnp.float32)
    xq, s = quantize_acts(x)
    assert xq.shape == x.shape and s.shape == (4, 8, 1)
    assert int(np.abs(np.asarray(xq)).max()) <= 127


def test_quant_dot_close_to_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 512)) * 0.04, jnp.float32)
    b = jnp.asarray(rng.standard_normal((512,)) * 0.01, jnp.float32)
    got = np.asarray(quant_dot(x, w, b))
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    # relative Frobenius error of dynamic W8A8 at these shapes is ~1e-2
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # row-wise cosine stays essentially 1
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.999


def test_quant_dot_batched_rank3():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.float32)
    out = quant_dot(x, w)
    assert out.shape == (2, 16, 32) and out.dtype == jnp.bfloat16


def test_int8_kernel_attention_close_to_float():
    """In-kernel W8A8 projections (fused_attention quant=True) vs the
    full-precision XLA oracle."""
    import jax

    from mmrp_tpu.ops.fused_attention import fused_attention, xla_equivalent

    rng = np.random.default_rng(7)
    B, L, C, h = 2, 16, 32, 4

    def t(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)

    x = t(B, L, C)
    params = dict(ln_scale=jnp.ones((C,)), ln_bias=t(C),
                  wq=t(C, C), bq=t(C), wk=t(C, C), bk=t(C),
                  wv=t(C, C), bv=t(C), wo=t(C, C), bo=t(C))
    mask = jnp.zeros((B, L), jnp.float32)
    got = fused_attention(x, params["ln_scale"], params["ln_bias"],
                          params["wq"], params["bq"], params["wk"],
                          params["bk"], params["wv"], params["bv"],
                          params["wo"], params["bo"], key_mask=mask,
                          num_heads=h, ln_mode="post", quant=True,
                          interpret=True)
    want = xla_equivalent(x, None, mask, params["ln_scale"],
                          params["ln_bias"], params["wq"], params["bq"],
                          params["wk"], params["bk"], params["wv"],
                          params["bv"], params["wo"], params["bo"],
                          num_heads=h, ln_mode="post")
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 0.05, err


@pytest.mark.parametrize("mode", ["int8_ffn", "int8_kernel"])
def test_int8_text_modes_close_to_float(mode, monkeypatch):
    """The hybrid text-quant modes (fused attention [int8-in-kernel for
    'int8_kernel'] + W8A8 FFN) stay close to the float encoder."""
    import jax

    from mmrp_tpu.models.text_encoder import TextConfig, TextEncoder

    if mode == "int8_kernel":
        # exercise the real kernel code path (interpret mode) on CPU
        monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")

    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, 100, (2, 16)).astype(np.int32))
    mask = jnp.ones((2, 16), jnp.int32)
    kw = dict(hidden_dim=32, num_layers=2, num_heads=2, intermediate_dim=64,
              dropout=0.0)
    m0 = TextEncoder(TextConfig.small(**kw))
    p = m0.init(jax.random.PRNGKey(0), ids, mask)
    o0 = m0.apply(p, ids, mask)
    m1 = TextEncoder(TextConfig.small(**kw, quant=mode))
    o1 = m1.apply(p, ids, mask)
    d = np.abs(np.asarray(o0["cls"], np.float32)
               - np.asarray(o1["cls"], np.float32)).max()
    assert d < 0.2, d
