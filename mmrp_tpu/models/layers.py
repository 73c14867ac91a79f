"""Shared neural building blocks (Flax linen)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Mlp(nn.Module):
    """Transformer MLP: dense -> GELU -> dropout -> dense -> dropout."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth — drop the whole residual branch per sample.

    Parity with the reference's StochasticDepth (src/Model/model.py:77-89):
    train-time scaling by 1/(1-rate), identity at eval.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


def ln_f32(x, scale, bias, out_dtype, affine_in_f32: bool = False,
           eps: float = 1e-6):
    """THE hand-rolled f32 LayerNorm of the XLA model paths (params shared
    with the fused Pallas kernels, so a Dense/LayerNorm module can't be
    used). eps and the cast discipline must match the in-kernel LNs
    (ops/fused_attention, fused_mlp, fused_swin_block) — the fused-vs-XLA
    parity tests pin this. ``affine_in_f32`` applies scale/bias before the
    output cast (the CrossAttention post-LN form); default applies them in
    ``out_dtype`` after the cast (every other site)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    n = (xf - mu) * jax.lax.rsqrt(var + eps)
    if affine_in_f32:
        return (n * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(out_dtype)
    n = n.astype(out_dtype)
    return n * scale.astype(out_dtype) + bias.astype(out_dtype)


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Classic sin/cos positional table (reference model.py:91-107)."""
    pos = np.arange(length)[:, None].astype(np.float64)
    half = (dim + 1) // 2
    div = np.exp(np.arange(half).astype(np.float64) * (-2.0 * np.log(10000.0) / dim))
    table = np.zeros((length, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div[: dim // 2])
    return table


class PositionalEncoding(nn.Module):
    """Adds a fixed sinusoidal positional encoding (static max length)."""

    max_len: int = 1024

    @nn.compact
    def __call__(self, x):
        table = jnp.asarray(sinusoidal_positions(self.max_len, x.shape[-1]))
        return x + table[None, : x.shape[1], :].astype(x.dtype)


class SelfAttentionBlock(nn.Module):
    """LN -> MHA -> residual; the generic full-attention block used by the
    fusion stack and enhancers."""

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            dtype=self.dtype,
        )(y, y, mask=mask, deterministic=deterministic)
        return x + y


class LnParams(nn.Module):
    """scale/bias with nn.LayerNorm's tree layout (for fused-kernel paths)."""

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        return s, b


class MhaParams(nn.Module):
    """query/key/value/out projection params as plain 2D (dim, dim) kernels
    — torch/HF's native Linear layout, what the fused attention kernel
    (ops/fused_attention.py) consumes, and a 1:1 port target (port.py)."""

    dim: int

    @nn.compact
    def __call__(self):
        q = DenseParams(self.dim, name="query")(self.dim)
        k = DenseParams(self.dim, name="key")(self.dim)
        v = DenseParams(self.dim, name="value")(self.dim)
        o = DenseParams(self.dim, name="out")(self.dim)
        return q, k, v, o


class DenseParams(nn.Module):
    """Kernel+bias parameters with nn.Dense's tree layout, without binding
    the matmul to this module — lets fused Pallas kernels consume the same
    checkpoint structure as the unfused nn.Dense path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b
