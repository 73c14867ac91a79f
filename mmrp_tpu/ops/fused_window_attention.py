"""Fused Swin window attention: qkv + partition + attention + proj in VMEM.

Motivation (measured on the target chip, tools/profile_ops.py): effective
HBM bandwidth is the binding constraint, and the unfused attention path
streams qkv (3x activations), padded relayouts, and the score tensor
(B*nW*h*N^2 — the largest single stream of the encoder) through HBM. This
kernel reads the (pre-LN'd, pre-rolled) feature map ONCE per block row,
computes qkv projection, window partition, biased softmax attention, and
the output projection entirely in VMEM, and writes the attended features
ONCE.

Grid: (B, H/ws) — one program per (image, window row). Weights and the
per-row bias slice are grid-invariant or row-indexed and stay VMEM-resident.
Shifted windows are handled by the caller's cyclic roll (cheap) + the
precomputed per-window additive mask folded into ``bias_full``.
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


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, o_ref,
            *, ws: int, num_heads: int, scale: float):
    # x block: (1, ws, W, C); bias block: (nWr, h, N, N)
    x = x_ref[0]  # (ws, W, C)
    W = x.shape[1]
    C = x.shape[2]
    nWr = W // ws
    N = ws * ws
    h = num_heads
    d = C // h

    # window partition: (ws, W, C) -> (nWr, N, C)
    xw = x.reshape(ws, nWr, ws, C).transpose(1, 0, 2, 3).reshape(nWr, N, C)

    # qkv projection in VMEM: (nWr*N, C) @ (C, 3C)
    qkv = (
        jnp.dot(xw.reshape(nWr * N, C), wqkv_ref[...],
                preferred_element_type=jnp.float32)
        + bqkv_ref[...][None, :]
    ).astype(x.dtype)
    qkv = qkv.reshape(nWr, N, 3, h, d)
    # head-major batched layout: (nWr*h, N, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(nWr * h, N, d)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(nWr * h, N, d)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(nWr * h, N, d)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nWr*h, N, N)
    scores = scores * scale + bias_ref[...].reshape(nWr * h, N, N)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)

    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (nWr*h, N, d)
    out = out.reshape(nWr, h, N, d).transpose(0, 2, 1, 3).reshape(nWr * N, C)

    proj = (
        jnp.dot(out, wproj_ref[...], preferred_element_type=jnp.float32)
        + bproj_ref[...][None, :]
    ).astype(x.dtype)
    # reverse partition: (nWr, N, C) -> (ws, W, C)
    o_ref[0] = (
        proj.reshape(nWr, ws, ws, C).transpose(1, 0, 2, 3).reshape(ws, W, C)
    )


def fused_window_attention(
    x: jnp.ndarray,        # (B, H, W, C) — post-LN, post-roll
    w_qkv: jnp.ndarray,    # (C, 3C)
    b_qkv: jnp.ndarray,    # (3C,)
    w_proj: jnp.ndarray,   # (C, C)
    b_proj: jnp.ndarray,   # (C,)
    bias_full: jnp.ndarray,  # (nW, h, N, N) f32: rel bias + shift mask
    ws: int,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    B, H, W, C = x.shape
    N = ws * ws
    nWr = W // ws
    d = C // num_heads
    scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}
    grid = (B, H // ws)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * H * W * (3 * C * C + C * C)
            + 4 * B * (H // ws) * nWr * num_heads * N * N * d,
            bytes_accessed=2 * B * H * W * C * 2 + bias_full.size * 4,
            transcendentals=B * (H // ws) * nWr * num_heads * N * N,
        )
    return pl.pallas_call(
        functools.partial(_kernel, ws=ws, num_heads=num_heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, W, C), lambda b, r: (b, r, 0, 0), **vm),
            pl.BlockSpec((C, 3 * C), lambda b, r: (0, 0), **vm),
            pl.BlockSpec((3 * C,), lambda b, r: (0,), **vm),
            pl.BlockSpec((C, C), lambda b, r: (0, 0), **vm),
            pl.BlockSpec((C,), lambda b, r: (0,), **vm),
            pl.BlockSpec(
                (nWr, num_heads, N, N), lambda b, r: (r, 0, 0, 0), **vm
            ),
        ],
        out_specs=pl.BlockSpec((1, ws, W, C), lambda b, r: (b, r, 0, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(x, w_qkv, b_qkv, w_proj, b_proj, bias_full)


def build_bias_full(rel_bias_table, ws: int, H: int, W: int, shift: int):
    """(nW, h, N, N) f32: relative position bias + shifted-window mask."""
    from mmrp_tpu.ops.window_attention import build_rel_bias, shift_attn_mask

    rel = build_rel_bias(rel_bias_table, ws)  # (h, N, N)
    nW = (H // ws) * (W // ws)
    if shift > 0:
        smask = jnp.asarray(shift_attn_mask(H, W, ws, shift))  # (nW, N, N)
        return smask[:, None] + rel[None]
    return jnp.broadcast_to(rel[None], (nW,) + rel.shape).astype(jnp.float32)
