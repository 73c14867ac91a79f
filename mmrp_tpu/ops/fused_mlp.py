"""Fused transformer MLP: residual + LN + FC1 + GELU + FC2 in VMEM (Pallas).

out = x + gelu(LN(x) @ W1 + b1) @ W2 + b2

On the HBM-bound target chip the unfused form streams the 4C hidden
activation (the widest tensor of every transformer block) to HBM between
the two GEMMs, plus separate LN and residual passes. This kernel reads x
once per row tile, keeps LN statistics, the hidden activation, and the
residual add in VMEM, and writes the block output once. All ops are rank-2
(Mosaic layout constraint). Weights stay VMEM-resident across the grid.

Differentiable: a custom VJP recomputes through the pure-XLA equivalent
(remat), so training takes this kernel on the forward pass while gradients
stay exact w.r.t. the same math.
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
            *, eps: float, post_ln: bool, include_residual: bool):
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
        # Swin form: out = [x +] FFN(LN(x)) — residual optional so training
        # can apply DropPath to the branch outside the kernel
        xn = _ln(xf, scale_ref[...], bias_ref[...], eps)
        h = jnp.dot(xn.astype(x.dtype), w1_ref[...],
                    preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + b1_ref[...][None, :])
        out = jnp.dot(h.astype(x.dtype), w2_ref[...],
                      preferred_element_type=jnp.float32)
        out = out + b2_ref[...][None, :]
        if include_residual:
            out = xf + out
        o_ref[...] = out.astype(x.dtype)


def xla_equivalent(
    x, ln_scale, ln_bias, w1, b1, w2, b2,
    *, eps: float = 1e-6, post_ln: bool = False, include_residual: bool = True,
) -> jnp.ndarray:
    """Pure-XLA computation of the SAME function as the kernel (matching
    dtype discipline) — the autodiff body of the custom VJP and the test
    oracle."""
    xf = x.astype(jnp.float32)
    if post_ln:
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + b1[None, :])
        y = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32)
        y = xf + y + b2[None, :]
        return _ln(y, ln_scale, ln_bias, eps).astype(x.dtype)
    xn = _ln(xf, ln_scale, ln_bias, eps)
    h = jnp.dot(xn.astype(x.dtype), w1, preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1[None, :])
    out = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32)
    out = out + b2[None, :]
    if include_residual:
        out = xf + out
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused(eps: float, block_rows: int, post_ln: bool, interpret: bool,
                include_residual: bool):
    """custom_vjp wrapper: Pallas forward, XLA-recompute backward (remat —
    the 4C hidden activation never persists to HBM in either pass)."""

    @jax.custom_vjp
    def f(x, ln_s, ln_b, w1, b1, w2, b2):
        return _pallas_impl(x, ln_s, ln_b, w1, b1, w2, b2, eps=eps,
                            block_rows=block_rows, post_ln=post_ln,
                            interpret=interpret,
                            include_residual=include_residual)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: xla_equivalent(
                *a, eps=eps, post_ln=post_ln,
                include_residual=include_residual,
            ),
            *res,
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


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
    include_residual: bool = True,
) -> jnp.ndarray:
    """Fused LN+MLP[+residual] — differentiable via custom VJP."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _make_fused(float(eps), int(block_rows), bool(post_ln),
                     bool(interpret), bool(include_residual))
    return fn(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _pallas_impl(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    eps: float,
    block_rows: int,
    post_ln: bool,
    interpret: bool,
    include_residual: bool,
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
        functools.partial(_kernel, eps=eps, post_ln=post_ln,
                          include_residual=include_residual),
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
