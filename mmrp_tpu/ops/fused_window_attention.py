"""Fused Swin window attention: qkv + attention + proj in VMEM (Pallas).

Motivation (measured on the target chip, tools/profile_ops.py): effective
HBM bandwidth is the binding constraint, and the unfused path streams qkv
(3x activations) plus the attention score tensor (B*nW*h*N^2 — the largest
single stream of the encoder) through HBM. This kernel consumes the
window-partitioned feature map (B, nW, N, C) and performs the qkv
projection, biased softmax attention, and output projection entirely in
VMEM: qkv and scores never touch HBM.

Mosaic constraints shaped the design: TPU vector layouts don't allow
sublane-splitting shape casts, so the kernel uses **no reshapes at all** —
only static lane slices (per-head views of the fused qkv), batched
dot_generals, and a lane-concat. Window partition/reverse and the shifted
-window cyclic roll stay in XLA where they are cheap relayouts; the
per-window shift masks fold into the precomputed ``bias_full`` tensor.

Grid: (B, nW / WBLK) — one program per (image, window block). Weights are
grid-invariant and stay VMEM-resident; the bias slice is window-indexed.
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


def _kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, bias_ref, o_ref,
            *, num_heads: int, scale: float, block_windows: int, ln_eps: float,
            include_residual: bool = True):
    # blocks: x (1, WBLK, N, C) RAW (pre-LN); bias (WBLK, h, N, N); weights
    # full. Computes o = x + proj(attn(LN(x))) — the whole first half of a
    # Swin block. Every tensor op is rank-2 — Mosaic's vector layouts reject
    # sublane-splitting/merging shape casts, so windows and heads are
    # static python unrolls over 2D matmuls and lane slices.
    C = x_ref.shape[3]
    h = num_heads
    d = C // h

    # Phase 1 — LN (batched 3D elementwise) + per-window qkv GEMMs.
    # Rank-3 x rank-2 dot_general lowers to an unsupported flattening cast
    # and broadcast-weight batched contraction SIGABRTs the compiler, so
    # the qkv/proj GEMMs stay per-window 2D.
    x3 = x_ref[0]  # (WBLK, N, C)
    xf3 = x3.astype(jnp.float32)
    mu = jnp.mean(xf3, axis=-1, keepdims=True)
    var = jnp.mean((xf3 - mu) ** 2, axis=-1, keepdims=True)
    xn3 = (
        (xf3 - mu) * jax.lax.rsqrt(var + ln_eps) * ln_s_ref[...][None, None, :]
        + ln_b_ref[...][None, None, :]
    ).astype(x3.dtype)
    qkv_b3 = jnp.stack(
        [
            (
                jnp.dot(xn3[w], wqkv_ref[...], preferred_element_type=jnp.float32)
                + bqkv_ref[...][None, :]
            ).astype(x3.dtype)
            for w in range(block_windows)
        ],
        axis=0,
    )  # (WBLK, N, 3C) — stack, not reshape

    # Phase 2 — attention batched over windows: per head, TWO 3D dot_generals
    # instead of 2*WBLK tiny dependent 2D matmuls (the serialized mini-matmul
    # chain measured 5.9 ms/block in the profiler).
    head_outs = []
    for head in range(h):  # per-head lane slices of the fused qkv
        q = qkv_b3[:, :, head * d : (head + 1) * d]            # (WBLK, N, d)
        k = qkv_b3[:, :, C + head * d : C + (head + 1) * d]
        v = qkv_b3[:, :, 2 * C + head * d : 2 * C + (head + 1) * d]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (WBLK, N, N)
        scores = scores * scale + bias_ref[:, head]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv_b3.dtype)
        head_outs.append(
            jax.lax.dot_general(
                p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(qkv_b3.dtype)  # (WBLK, N, d)
        )
    attn_b3 = jnp.concatenate(head_outs, axis=-1)  # (WBLK, N, C)

    # Phase 3 — per-window proj GEMMs (+ fused residual unless the caller
    # wants the raw branch, e.g. to apply DropPath during training).
    for w in range(block_windows):
        proj = (
            jnp.dot(attn_b3[w], wproj_ref[...], preferred_element_type=jnp.float32)
            + bproj_ref[...][None, :]
        )
        if include_residual:
            proj = xf3[w] + proj
        o_ref[0, w] = proj.astype(x_ref.dtype)


def _pallas_impl(
    xw: jnp.ndarray,       # (B, nW, N, C) — RAW (pre-LN), post-roll, partitioned
    ln_scale: jnp.ndarray,  # (C,)
    ln_bias: jnp.ndarray,   # (C,)
    w_qkv: jnp.ndarray,    # (C, 3C)
    b_qkv: jnp.ndarray,    # (3C,)
    w_proj: jnp.ndarray,   # (C, C)
    b_proj: jnp.ndarray,   # (C,)
    bias_full: jnp.ndarray,  # (nW, h, N, N) f32: rel bias + shift mask
    num_heads: int,
    block_windows: int,
    ln_eps: float,
    interpret: bool,
    include_residual: bool,
) -> jnp.ndarray:
    B, nW, N, C = xw.shape
    d = C // num_heads
    scale = d**-0.5
    wblk = block_windows
    while wblk > 1 and nW % wblk:
        wblk //= 2
    wblk = max(wblk, 1)

    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * nW * N * (3 * C * C + C * C)
            + 4 * B * nW * num_heads * N * N * d,
            bytes_accessed=2 * B * nW * N * C * 2 + bias_full.size * 4,
            transcendentals=B * nW * num_heads * N * N,
        )
    # Grid order (window-block OUTER, batch INNER): the bias block's index
    # map depends only on the window dim, so consecutive batch iterations
    # reuse the VMEM-resident bias instead of re-DMA-ing it per image —
    # bias traffic drops from B*nW*h*N^2 to nW*h*N^2 (measured multi-ms at
    # stage-1 shapes where the padded f32 bias is the largest stream).
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale,
                          block_windows=wblk, ln_eps=ln_eps,
                          include_residual=include_residual),
        out_shape=jax.ShapeDtypeStruct((B, nW, N, C), xw.dtype),
        grid=(nW // wblk, B),
        in_specs=[
            pl.BlockSpec((1, wblk, N, C), lambda w, b: (b, w, 0, 0), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C, 3 * C), lambda w, b: (0, 0), **vm),
            pl.BlockSpec((3 * C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C, C), lambda w, b: (0, 0), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec(
                (wblk, num_heads, N, N), lambda w, b: (w, 0, 0, 0), **vm
            ),
        ],
        out_specs=pl.BlockSpec((1, wblk, N, C), lambda w, b: (b, w, 0, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(xw, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias_full)


def xla_equivalent(
    xw, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias_full,
    *, num_heads: int, ln_eps: float = 1e-6, include_residual: bool = True,
) -> jnp.ndarray:
    """Pure-XLA computation of the SAME function as the Pallas kernel
    (matching dtype discipline: f32 LN/softmax/accum, inputs' dtype GEMM
    operands). Used as the autodiff body of the kernel's custom VJP and as
    the correctness oracle in tests."""
    B, nW, N, C = xw.shape
    h = num_heads
    d = C // h
    scale = d**-0.5
    xf = xw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = (
        (xf - mu) * jax.lax.rsqrt(var + ln_eps) * ln_scale[None, None, None, :]
        + ln_bias[None, None, None, :]
    ).astype(xw.dtype)
    qkv = (
        jnp.einsum("bwnc,ck->bwnk", xn, w_qkv, preferred_element_type=jnp.float32)
        + b_qkv
    ).astype(xw.dtype)  # (B, nW, N, 3C)
    qkv = qkv.reshape(B, nW, N, 3, h, d)
    q = qkv[..., 0, :, :]
    k = qkv[..., 1, :, :]
    v = qkv[..., 2, :, :]
    scores = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale + bias_full[None].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(xw.dtype)
    attn = jnp.einsum("bwhqk,bwkhd->bwqhd", p, v,
                      preferred_element_type=jnp.float32).astype(xw.dtype)
    attn = attn.reshape(B, nW, N, C)
    proj = (
        jnp.einsum("bwnc,ck->bwnk", attn, w_proj,
                   preferred_element_type=jnp.float32)
        + b_proj
    )
    if include_residual:
        proj = xf + proj
    return proj.astype(xw.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused(num_heads: int, block_windows: int, ln_eps: float,
                interpret: bool, include_residual: bool):
    """custom_vjp wrapper: Pallas forward, XLA-recompute backward (remat —
    qkv/scores never persist to HBM in either pass)."""

    @jax.custom_vjp
    def f(xw, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias_full):
        return _pallas_impl(xw, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                            bias_full, num_heads, block_windows, ln_eps,
                            interpret, include_residual)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: xla_equivalent(
                *a, num_heads=num_heads, ln_eps=ln_eps,
                include_residual=include_residual,
            ),
            *res,
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_window_attention_windows(
    xw: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    bias_full: jnp.ndarray,
    num_heads: int,
    block_windows: Optional[int] = None,
    ln_eps: float = 1e-6,
    interpret: Optional[bool] = None,
    include_residual: bool = True,
) -> jnp.ndarray:
    """proj(attention(LN(x))) [+ x] in window layout — differentiable.

    Forward runs the fused Pallas kernel; gradients come from a custom VJP
    that recomputes through :func:`xla_equivalent`.
    """
    import os

    if block_windows is None:
        block_windows = int(os.environ.get("MMRP_WBLK", "16"))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _make_fused(num_heads, int(block_windows), float(ln_eps),
                     bool(interpret), bool(include_residual))
    return fn(xw, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, bias_full)


def build_bias_full(rel_bias_table, ws: int, H: int, W: int, shift: int):
    """(nW, h, N, N) f32: relative position bias + shifted-window mask."""
    from mmrp_tpu.ops.window_attention import build_rel_bias, shift_attn_mask

    rel = build_rel_bias(rel_bias_table, ws)  # (h, N, N)
    nW = (H // ws) * (W // ws)
    if shift > 0:
        smask = jnp.asarray(shift_attn_mask(H, W, ws, shift))  # (nW, N, N)
        return smask[:, None] + rel[None]
    return jnp.broadcast_to(rel[None], (nW,) + rel.shape).astype(jnp.float32)
