"""Fused transformer MLP: residual + LN + FC1 + GELU + FC2 in VMEM (Pallas).

out = x + gelu(LN(x) @ W1 + b1) @ W2 + b2

On the HBM-bound target chip the unfused form streams the 4C hidden
activation (the widest tensor of every transformer block) to HBM between
the two GEMMs, plus separate LN and residual passes. This kernel reads x
once per row tile, keeps LN statistics, the hidden activation, and the
residual add in VMEM, and writes the block output once. All ops are rank-2
(Mosaic layout constraint). Weights stay VMEM-resident across the grid.

Inference-only until a custom VJP lands (the callers gate on
``deterministic``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _ln(xf, scale, bias, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale[None, :] + bias[None, :]


def _kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, eps: float, post_ln: bool):
    x = x_ref[...]  # (R, C)
    xf = x.astype(jnp.float32)
    if post_ln:
        # BERT form: out = LN(x + FFN(x))
        h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + b1_ref[...][None, :])
        y = jnp.dot(h.astype(x.dtype), w2_ref[...],
                    preferred_element_type=jnp.float32)
        y = xf + y + b2_ref[...][None, :]
        o_ref[...] = _ln(y, scale_ref[...], bias_ref[...], eps).astype(x.dtype)
    else:
        # Swin form: out = x + FFN(LN(x))
        xn = _ln(xf, scale_ref[...], bias_ref[...], eps)
        h = jnp.dot(xn.astype(x.dtype), w1_ref[...],
                    preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + b1_ref[...][None, :])
        out = jnp.dot(h.astype(x.dtype), w2_ref[...],
                      preferred_element_type=jnp.float32)
        o_ref[...] = (xf + out + b2_ref[...][None, :]).astype(x.dtype)


def fused_ln_mlp_residual(
    x: jnp.ndarray,       # (M, C) row-flattened activations
    ln_scale: jnp.ndarray,  # (C,)
    ln_bias: jnp.ndarray,   # (C,)
    w1: jnp.ndarray,        # (C, Hd)
    b1: jnp.ndarray,        # (Hd,)
    w2: jnp.ndarray,        # (Hd, C)
    b2: jnp.ndarray,        # (C,)
    eps: float = 1e-6,
    block_rows: int = 512,
    post_ln: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    M, C = x.shape
    Hd = w1.shape[1]
    # Mosaic wants the sublane block dim divisible by 8 OR equal to the full
    # array dim: pick the largest 8-multiple divisor of M <= block_rows,
    # falling back to the whole array in one block.
    r = M
    cand = (block_rows // 8) * 8
    while cand >= 8:
        if M % cand == 0:
            r = cand
            break
        cand -= 8
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=4 * M * C * Hd,
            bytes_accessed=2 * M * C * x.dtype.itemsize + 2 * C * Hd * 2,
            transcendentals=M * Hd,
        )
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, post_ln=post_ln),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(M // r,),
        in_specs=[
            pl.BlockSpec((r, C), lambda i: (i, 0), **vm),
            pl.BlockSpec((C,), lambda i: (0,), **vm),
            pl.BlockSpec((C,), lambda i: (0,), **vm),
            pl.BlockSpec((C, Hd), lambda i: (0, 0), **vm),
            pl.BlockSpec((Hd,), lambda i: (0,), **vm),
            pl.BlockSpec((Hd, C), lambda i: (0, 0), **vm),
            pl.BlockSpec((C,), lambda i: (0,), **vm),
        ],
        out_specs=pl.BlockSpec((r, C), lambda i: (i, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)
