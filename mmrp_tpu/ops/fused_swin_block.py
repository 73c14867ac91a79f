"""Whole-Swin-block Pallas kernel: LN+qkv+attn+proj+res+LN+MLP+res in VMEM.

Round-2 trace analysis (docs/ROOFLINE.md): with the attention-only window
kernel (ops/fused_window_attention.py) + separate MLP pass, Swin-T still
burns ~17.5 ms of the 44 ms embed step at only ~33 TFLOP/s effective. The
residue is op-boundary traffic — the feature map makes FOUR HBM round
trips per block (attn kernel, residual add, MLP, residual add), plus
f32<->bf16 converts around every LayerNorm — and small-M GEMM latency:
the attention kernel runs one (49, C) GEMM per window, serialized.

This kernel computes an ENTIRE Swin block,

    y   = x + proj(attn(LN0(x)))
    out = y + W2 @ gelu(W1 @ LN1(y))

in one VMEM residency: the feature map is read once and written once per
block. Windows are padded 49 -> 56 tokens (one sublane tile) so that the
(ib, wblk, 56, C) block reshapes LOSSLESSLY to (ib*wblk*56, C) rows —
qkv, proj, and both MLP GEMMs each run as a SINGLE large-M matmul over
every window in the block (M = ib*wblk*56 >= 448 by default), replacing
the per-window M=49 GEMM chains that left stage 3 at 2.3x off roof. Pad
tokens cost +14% GEMM FLOPs (Swin is bandwidth/latency-bound here, not
FLOP-bound) and are masked out of attention via -1e9 pad-key bias; pad
rows carry garbage that window_reverse_padded never reads.

Reference parity target: timm swin blocks consumed via
/root/reference/src/Model/fusion.py:92 (swin_base_patch4_window7_224);
block math matches models/swin.py::SwinBlock's XLA path (oracle in
tests/test_fused_swin_block.py).

Differentiable via custom VJP (XLA recompute), though the model uses it
on the deterministic/serving path; training composes the per-part fused
kernels which support DropPath's branch separation.
"""

from __future__ import annotations

import functools
import os
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


# ---------------------------------------------------------------------------
# Padded window layout helpers (XLA side)
# ---------------------------------------------------------------------------


def padded_tokens(ws: int) -> int:
    """Window token count rounded up to a sublane tile (8)."""
    return ((ws * ws + 7) // 8) * 8


def window_partition_padded(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nW, npad, C); rows ws*ws..npad are zero.

    NOTE: the kernel no longer wants pre-padded windows (the pad copy cost
    a full extra HBM round trip per block — measured regression); it pads
    in VMEM. Kept for tests/diagnostics."""
    from mmrp_tpu.ops.window_attention import window_partition

    xw = window_partition(x, ws)  # (B, nW, N, C)
    npad = padded_tokens(ws)
    n = ws * ws
    if npad == n:
        return xw
    return jnp.pad(xw, ((0, 0), (0, 0), (0, npad - n), (0, 0)))


def window_reverse_padded(xw: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B, nW, npad, C) -> (B, H, W, C), dropping pad rows."""
    from mmrp_tpu.ops.window_attention import window_reverse

    return window_reverse(xw[:, :, : ws * ws], ws, H, W)


def build_bias_padded(rel_bias_table, ws: int, H: int, W: int, shift: int):
    """(nW, h, npad, npad) f32: rel-pos bias + shift mask + pad-key mask."""
    from mmrp_tpu.ops.fused_window_attention import build_bias_full

    bias = build_bias_full(rel_bias_table, ws, H, W, shift)  # (nW, h, N, N)
    npad = padded_tokens(ws)
    n = ws * ws
    if npad == n:
        return bias
    bias = jnp.pad(bias, ((0, 0), (0, 0), (0, npad - n), (0, npad - n)))
    key_pad = jnp.where(jnp.arange(npad) >= n, -1e9, 0.0).astype(jnp.float32)
    return bias + key_pad[None, None, None, :]


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _ln_rows(xf, scale_ref, bias_ref, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale_ref[...][None, :] \
        + bias_ref[...][None, :]


def _static_gemm(s_ref, sa):
    """W8A8 GEMM closure with a PRE-QUANTIZED int8 weight ref + per-out-
    channel f32 scale ref. ``sa`` (a Python float, compile-time constant)
    is the calibrated per-tensor activation scale: the abs-max/127 of this
    GEMM's input on a calibration set (models/quant_calib.py). With it,
    the only per-element activation work left is one multiply + round +
    clip — the dynamic scheme's abs-max reduce AND the per-grid-program
    weight re-quantization pass (the diagnosed cause of the +9.5% dynamic
    int8-in-Swin loss, docs/ROOFLINE.md §6) are both gone. sa=None keeps
    dynamic per-row activation scales (weights still static)."""

    def gemm(x, w_ref, b_ref):
        xf = x.astype(jnp.float32)
        if sa is not None:
            xq = jnp.clip(jnp.round(xf * (1.0 / sa)), -127.0, 127.0
                          ).astype(jnp.int8)
        else:
            sx = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
            xq = jnp.round(xf / sx).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * s_ref[...][None, :]
        out = out * sa if sa is not None else out * sx
        return out + b_ref[...][None, :]

    return gemm


def _block_body(x4, ln0_s_ref, ln0_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, bias_ref, *, num_heads: int, scale: float, eps: float,
                npad: int, quant, scale_refs=None, act_scales=None):
    """Shared whole-block math on an in-VMEM (ib, wblk, N, C) array.
    Returns (ib, wblk, npad, C); rows N..npad (if any) carry garbage.

    quant: False = bf16 GEMMs; True = dynamic W8A8 (weights re-quantized
    in VMEM per grid program); "static" = pre-quantized int8 weight refs
    + ``scale_refs`` (4 per-out-channel f32 scale vectors, qkv/proj/w1/w2
    order) + optional ``act_scales`` (4 calibrated per-tensor activation
    scales as Python floats)."""
    if quant == "static":
        a = act_scales if act_scales is not None else (None,) * 4
        gemm_qkv = _static_gemm(scale_refs[0], a[0])
        gemm_proj = _static_gemm(scale_refs[1], a[1])
        gemm_mlp1 = _static_gemm(scale_refs[2], a[2])
        gemm_mlp2 = _static_gemm(scale_refs[3], a[3])
    elif quant:
        from mmrp_tpu.ops.fused_attention import _qdot

        def gemm(x, w_ref, b_ref):
            return _qdot(x, w_ref) + b_ref[...][None, :]
        gemm_qkv = gemm_proj = gemm_mlp1 = gemm_mlp2 = gemm
    else:
        def gemm(x, w_ref, b_ref):
            return jnp.dot(x, w_ref[...],
                           preferred_element_type=jnp.float32) \
                + b_ref[...][None, :]
        gemm_qkv = gemm_proj = gemm_mlp1 = gemm_mlp2 = gemm
    ib, wblk, N, C = x4.shape           # N = ws*ws (unpadded)
    h = num_heads
    d = C // h
    rows = ib * wblk * npad
    nb = ib * wblk

    if npad != N:
        # pad windows to a sublane tile IN VMEM (a pre-padded HBM layout
        # cost one extra full-map round trip per block — measured)
        x4 = jnp.concatenate(
            [x4, jnp.zeros((ib, wblk, npad - N, C), x4.dtype)], axis=2)
    x2 = x4.reshape(rows, C)            # lossless: npad % 8 == 0
    xf2 = x2.astype(jnp.float32)

    # --- attention half ---
    qin = _ln_rows(xf2, ln0_s_ref, ln0_b_ref, eps).astype(x2.dtype)
    qkv2 = gemm_qkv(qin, wqkv_ref, bqkv_ref).astype(x2.dtype)
    # (rows, 3C) — ONE GEMM, all windows
    qkv3 = qkv2.reshape(nb, npad, 3 * C)

    head_outs = []
    for head in range(h):
        sl = slice(head * d, (head + 1) * d)
        q = qkv3[:, :, head * d : (head + 1) * d]
        k = qkv3[:, :, C + head * d : C + (head + 1) * d]
        v = qkv3[:, :, 2 * C + head * d : 2 * C + (head + 1) * d]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                        # (nb, npad, npad)
        bias_h = bias_ref[:, head]                       # (wblk, npad, npad)
        if ib > 1:
            bias_h = jnp.broadcast_to(
                bias_h[None], (ib, wblk, npad, npad)
            ).reshape(nb, npad, npad)
        scores = scores + bias_h
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x2.dtype)
        head_outs.append(
            jax.lax.dot_general(
                p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x2.dtype)                           # (nb, npad, d)
        )
    attn3 = jnp.concatenate(head_outs, axis=-1)          # (nb, npad, C)
    attn2 = attn3.reshape(rows, C)

    y2 = xf2 + gemm_proj(attn2, wproj_ref, bproj_ref)    # (rows, C) f32

    # --- MLP half ---
    z = _ln_rows(y2, ln1_s_ref, ln1_b_ref, eps).astype(x2.dtype)
    hdn = jax.nn.gelu(gemm_mlp1(z, w1_ref, b1_ref)).astype(x2.dtype)
    out2 = y2 + gemm_mlp2(hdn, w2_ref, b2_ref)
    return out2.astype(x2.dtype).reshape(ib, wblk, npad, C)


def _kernel(x_ref, ln0_s_ref, ln0_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            bias_ref, *rest, num_heads: int, scale: float, eps: float,
            npad: int, quant=False, act_scales=None):
    # static-quant flavor appends 4 per-out-channel scale refs after bias
    if quant == "static":
        sqkv_ref, sproj_ref, s1_ref, s2_ref, o_ref = rest
        scale_refs = (sqkv_ref, sproj_ref, s1_ref, s2_ref)
    else:
        (o_ref,) = rest
        scale_refs = None
    N = x_ref.shape[2]
    out4 = _block_body(
        x_ref[...], ln0_s_ref, ln0_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
        bproj_ref, ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        bias_ref, num_heads=num_heads, scale=scale, eps=eps, npad=npad,
        quant=quant, scale_refs=scale_refs, act_scales=act_scales,
    )
    o_ref[...] = out4[:, :, :N]         # pad rows never reach HBM


def _kernel_raw(x_ref, ln0_s_ref, ln0_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, bias_ref, o_ref, *, num_heads: int, scale: float,
                eps: float, ws: int, quant: bool = False):
    """Raw-map flavor: the block is (ib, ws, W, C) — one window ROW of the
    un-partitioned feature map per grid step, indexed directly by the
    BlockSpec (windows tile the map, so no XLA-side partition/reverse
    transpose ever exists). The window transpose happens here IN VMEM:
    (ib, ws, nWw, ws, C) -> (ib, nWw, ws*ws, C)."""
    ib, _, Wd, C = x_ref.shape
    nWw = Wd // ws
    N = ws * ws
    x5 = x_ref[...].reshape(ib, ws, nWw, ws, C)     # pure view
    x4 = x5.transpose(0, 2, 1, 3, 4).reshape(ib, nWw, N, C)
    out4 = _block_body(
        x4, ln0_s_ref, ln0_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
        bproj_ref, ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        bias_ref, num_heads=num_heads, scale=scale, eps=eps, npad=N,
        quant=quant,
    )                                               # (ib, nWw, N, C)
    o5 = out4.reshape(ib, nWw, ws, ws, C).transpose(0, 2, 1, 3, 4)
    o_ref[...] = o5.reshape(ib, ws, Wd, C)


def _kernel_win(x_ref, ln0_s_ref, ln0_b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, bias_ref, o_ref, *, num_heads: int, scale: float,
                eps: float):
    """Small-C flavor: per-window 2D GEMMs, no padding anywhere — the
    attention-only kernel's structure (77% of the HBM roof at stage 1)
    plus the MLP phase folded in. bias_ref here is UNPADDED (wblk,h,N,N)."""
    _, wblk, N, C = x_ref.shape
    h = num_heads
    d = C // h

    x3 = x_ref[0]                        # (wblk, N, C)
    xf3 = x3.astype(jnp.float32)
    mu = jnp.mean(xf3, axis=-1, keepdims=True)
    var = jnp.mean((xf3 - mu) ** 2, axis=-1, keepdims=True)
    xn3 = (
        (xf3 - mu) * jax.lax.rsqrt(var + eps) * ln0_s_ref[...][None, None, :]
        + ln0_b_ref[...][None, None, :]
    ).astype(x3.dtype)
    qkv_b3 = jnp.stack(
        [
            (
                jnp.dot(xn3[w], wqkv_ref[...],
                        preferred_element_type=jnp.float32)
                + bqkv_ref[...][None, :]
            ).astype(x3.dtype)
            for w in range(wblk)
        ],
        axis=0,
    )  # (wblk, N, 3C)

    head_outs = []
    for head in range(h):
        q = qkv_b3[:, :, head * d : (head + 1) * d]
        k = qkv_b3[:, :, C + head * d : C + (head + 1) * d]
        v = qkv_b3[:, :, 2 * C + head * d : 2 * C + (head + 1) * d]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[:, head]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x3.dtype)
        head_outs.append(
            jax.lax.dot_general(
                p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x3.dtype)
        )
    attn_b3 = jnp.concatenate(head_outs, axis=-1)  # (wblk, N, C)

    for w in range(wblk):
        y = xf3[w] + (
            jnp.dot(attn_b3[w], wproj_ref[...],
                    preferred_element_type=jnp.float32)
            + bproj_ref[...][None, :]
        )                                           # (N, C) f32
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
        z = (
            (y - mu) * jax.lax.rsqrt(var + eps) * ln1_s_ref[...][None, :]
            + ln1_b_ref[...][None, :]
        ).astype(x3.dtype)
        hdn = jax.nn.gelu(
            jnp.dot(z, w1_ref[...], preferred_element_type=jnp.float32)
            + b1_ref[...][None, :]
        ).astype(x3.dtype)
        out = y + (
            jnp.dot(hdn, w2_ref[...], preferred_element_type=jnp.float32)
            + b2_ref[...][None, :]
        )
        o_ref[0, w] = out.astype(x_ref.dtype)


def _pallas_impl(xw, ln0_s, ln0_b, wqkv, bqkv, wproj, bproj,
                 ln1_s, ln1_b, w1, b1, w2, b2, bias_pad,
                 *, num_heads, eps, wblk, ib, pad_gemm, nopad, quant,
                 interpret, wscales=None, act_scales=None):
    B, nW, N, C = xw.shape             # N = ws*ws, unpadded
    npad = bias_pad.shape[-1]
    hidden = w1.shape[1]
    d = C // num_heads
    scale = d**-0.5
    while wblk > 1 and nW % wblk:
        wblk //= 2
    wblk = max(min(wblk, nW), 1)
    while ib > 1 and B % ib:
        ib //= 2
    ib = max(ib, 1)
    if nopad and pad_gemm:
        # unpadded large-M flavor: skip the 49 -> 56 VMEM pad; every GEMM
        # runs on rows = ib*wblk*N (392 at all Swin-B stage geometries,
        # still a sublane multiple) — saves the +14% pad-row GEMM FLOPs
        # and the 56^2-vs-49^2 attention-score waste. Relies on Mosaic
        # accepting the non-tile-aligned (ib, wblk, N, C) -> (rows, C)
        # relayout; gate stays env-off until measured on hardware.
        bias_pad = bias_pad[:, :, :N, :N]
        npad = N

    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * nW * npad * C * (4 * C + 2 * hidden)
            + 4 * B * nW * num_heads * npad * npad * d,
            bytes_accessed=4 * B * nW * N * C * 2
            + 2 * (4 * C * C + 2 * C * hidden),
            transcendentals=B * nW * num_heads * npad * npad,
        )
    if quant == "static" and not pad_gemm:
        raise ValueError("static W8A8 requires the pad_gemm flavor")
    if pad_gemm:
        kernel = functools.partial(_kernel, num_heads=num_heads, scale=scale,
                                   eps=eps, npad=npad, quant=quant,
                                   act_scales=act_scales)
        bias = bias_pad
        nb = npad
    else:
        # small-C flavor: unpadded per-window GEMMs, single image per block
        kernel = functools.partial(_kernel_win, num_heads=num_heads,
                                   scale=scale, eps=eps)
        bias = bias_pad[:, :, :N, :N]
        nb = N
        ib = 1

    # grid order (window-block OUTER, image-block INNER): the bias block
    # depends only on the window index, so it stays VMEM-resident across
    # the whole batch sweep (same reuse argument as the attention kernel).
    in_specs = [
        pl.BlockSpec((ib, wblk, N, C), lambda w, b: (b, w, 0, 0), **vm),
        pl.BlockSpec((C,), lambda w, b: (0,), **vm),
        pl.BlockSpec((C,), lambda w, b: (0,), **vm),
        pl.BlockSpec((C, 3 * C), lambda w, b: (0, 0), **vm),
        pl.BlockSpec((3 * C,), lambda w, b: (0,), **vm),
        pl.BlockSpec((C, C), lambda w, b: (0, 0), **vm),
        pl.BlockSpec((C,), lambda w, b: (0,), **vm),
        pl.BlockSpec((C,), lambda w, b: (0,), **vm),
        pl.BlockSpec((C,), lambda w, b: (0,), **vm),
        pl.BlockSpec((C, hidden), lambda w, b: (0, 0), **vm),
        pl.BlockSpec((hidden,), lambda w, b: (0,), **vm),
        pl.BlockSpec((hidden, C), lambda w, b: (0, 0), **vm),
        pl.BlockSpec((C,), lambda w, b: (0,), **vm),
        pl.BlockSpec(
            (wblk, num_heads, nb, nb), lambda w, b: (w, 0, 0, 0), **vm
        ),
    ]
    args = [xw, ln0_s, ln0_b, wqkv, bqkv, wproj, bproj,
            ln1_s, ln1_b, w1, b1, w2, b2, bias]
    if quant == "static":
        # per-out-channel dequant scale vectors (qkv/proj/w1/w2 order),
        # VMEM-resident like the biases
        for s, n_out in zip(wscales, (3 * C, C, hidden, C)):
            if s.shape != (n_out,):
                raise ValueError(f"weight scale shape {s.shape} != ({n_out},)")
            in_specs.append(pl.BlockSpec((n_out,), lambda w, b: (0,), **vm))
            args.append(s)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nW, N, C), xw.dtype),
        grid=(nW // wblk, B // ib),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ib, wblk, N, C), lambda w, b: (b, w, 0, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(*args)


def _pallas_impl_raw(x, ln0_s, ln0_b, wqkv, bqkv, wproj, bproj,
                     ln1_s, ln1_b, w1, b1, w2, b2, bias_pad,
                     *, num_heads, eps, ws, ib, quant, interpret):
    """Raw-map whole block: x is the UN-PARTITIONED (B, H, W, C) feature
    map (pre-rolled by the caller for shifted blocks). Each grid step
    covers (ib images) x (one window row = W//ws windows); the BlockSpec
    slices the map directly, so window partition/reverse never touch HBM.
    GEMM geometry matches the tuned unpadded flavor: rows = ib*nWw*49
    (= 392 at every Swin-B stage with the default ib)."""
    B, H, Wd, C = x.shape
    nWh, nWw = H // ws, Wd // ws
    N = ws * ws
    hidden = w1.shape[1]
    d = C // num_heads
    scale = d**-0.5
    while ib > 1 and B % ib:
        ib //= 2
    ib = max(ib, 1)
    bias = bias_pad[:, :, :N, :N]      # (nW, h, N, N), unpadded

    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * nWh * nWw * N * C * (4 * C + 2 * hidden)
            + 4 * B * nWh * nWw * num_heads * N * N * d,
            bytes_accessed=4 * B * H * Wd * C * 2
            + 2 * (4 * C * C + 2 * C * hidden),
            transcendentals=B * nWh * nWw * num_heads * N * N,
        )
    kernel = functools.partial(_kernel_raw, num_heads=num_heads, scale=scale,
                               eps=eps, ws=ws, quant=quant)
    # window-row OUTER, image-block INNER: the bias row block stays
    # VMEM-resident across the batch sweep (same reuse as the other grids)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Wd, C), x.dtype),
        grid=(nWh, B // ib),
        in_specs=[
            pl.BlockSpec((ib, ws, Wd, C), lambda w, b: (b, w, 0, 0), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C, 3 * C), lambda w, b: (0, 0), **vm),
            pl.BlockSpec((3 * C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C, C), lambda w, b: (0, 0), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec((C, hidden), lambda w, b: (0, 0), **vm),
            pl.BlockSpec((hidden,), lambda w, b: (0,), **vm),
            pl.BlockSpec((hidden, C), lambda w, b: (0, 0), **vm),
            pl.BlockSpec((C,), lambda w, b: (0,), **vm),
            pl.BlockSpec(
                (nWw, num_heads, N, N), lambda w, b: (w, 0, 0, 0), **vm
            ),
        ],
        out_specs=pl.BlockSpec(
            (ib, ws, Wd, C), lambda w, b: (b, w, 0, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(x, ln0_s, ln0_b, wqkv, bqkv, wproj, bproj,
      ln1_s, ln1_b, w1, b1, w2, b2, bias)


@functools.lru_cache(maxsize=None)
def _make_fused_raw(num_heads, eps, ws, ib, quant, interpret):
    @jax.custom_vjp
    def f(x, *params):
        return _pallas_impl_raw(x, *params, num_heads=num_heads, eps=eps,
                                ws=ws, ib=ib, quant=quant,
                                interpret=interpret)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        x, *params = res

        def body(x_, *ps):
            from mmrp_tpu.ops.window_attention import (
                window_partition, window_reverse,
            )

            H, Wd = x_.shape[1], x_.shape[2]
            xw = window_partition(x_, ws)
            ow = xla_equivalent(xw, *ps, num_heads=num_heads, eps=eps)
            return window_reverse(ow, ws, H, Wd)

        _, vjp = jax.vjp(body, x, *params)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_swin_block_raw(
    x: jnp.ndarray,                    # (B, H, W, C) raw map, pre-rolled
    ln0_scale, ln0_bias,
    w_qkv, b_qkv, w_proj, b_proj,
    ln1_scale, ln1_bias,
    w1, b1, w2, b2,
    bias_pad: jnp.ndarray,             # (nW, h, npad, npad) or (nW, h, N, N)
    num_heads: int,
    ws: int,
    *,
    image_block: Optional[int] = None,
    quant: bool = False,
    ln_eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Whole Swin block consuming the UN-PARTITIONED feature map — the
    XLA-side window partition/reverse copies (stage-1 relayouts were
    ~3.7 ms of the Swin-B embed trace, docs/ROOFLINE.md §6) never exist;
    the window transpose is an in-VMEM relayout per grid block.
    Differentiable (custom VJP recomputes partition + xla_equivalent +
    reverse)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Wd, C = x.shape
    nWw = Wd // ws
    if image_block is None:
        image_block = int(os.environ.get(
            "MMRP_SWIB", str(max(1, 448 // (nWw * padded_tokens(ws))))))
    fn = _make_fused_raw(num_heads, float(ln_eps), int(ws), int(image_block),
                         bool(quant), bool(interpret))
    return fn(x, ln0_scale, ln0_bias, w_qkv, b_qkv, w_proj, b_proj,
              ln1_scale, ln1_bias, w1, b1, w2, b2, bias_pad)


# ---------------------------------------------------------------------------
# XLA oracle (same math / dtype discipline) + custom VJP
# ---------------------------------------------------------------------------


def xla_equivalent(xw, ln0_s, ln0_b, wqkv, bqkv, wproj, bproj,
                   ln1_s, ln1_b, w1, b1, w2, b2, bias_pad,
                   *, num_heads: int, eps: float = 1e-6,
                   return_act_amax: bool = False):
    """Pure-XLA whole-block computation on (unpadded) windows — the
    autodiff body of the custom VJP and the correctness oracle in tests.
    bias_pad may be padded (nW, h, npad, npad); only the real N x N slice
    is consumed. return_act_amax=True additionally returns the 4 GEMM
    inputs' abs-max (qkv/proj/w1/w2 order) — the per-block calibration
    statistic of the static W8A8 path (models/quant_calib.py)."""
    B, nW, N, C = xw.shape
    h = num_heads
    d = C // h
    scale = d**-0.5
    bias_pad = bias_pad[:, :, :N, :N]

    def ln(tf, s, b):
        mu = tf.mean(-1, keepdims=True)
        var = ((tf - mu) ** 2).mean(-1, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + eps) * s + b

    xf = xw.astype(jnp.float32)
    qin = ln(xf, ln0_s, ln0_b).astype(xw.dtype)
    qkv = (
        jnp.einsum("bwnc,ck->bwnk", qin, wqkv,
                   preferred_element_type=jnp.float32) + bqkv
    ).astype(xw.dtype)
    qkv = qkv.reshape(B, nW, N, 3, h, d)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    scores = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias_pad[None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(xw.dtype)
    attn = jnp.einsum("bwhqk,bwkhd->bwqhd", p, v,
                      preferred_element_type=jnp.float32).astype(xw.dtype)
    attn = attn.reshape(B, nW, N, C)
    y = xf + (
        jnp.einsum("bwnc,ck->bwnk", attn, wproj,
                   preferred_element_type=jnp.float32) + bproj
    )
    z = ln(y, ln1_s, ln1_b).astype(xw.dtype)
    hdn = jax.nn.gelu(
        jnp.einsum("bwnc,ch->bwnh", z, w1,
                   preferred_element_type=jnp.float32) + b1
    ).astype(xw.dtype)
    out = y + (
        jnp.einsum("bwnh,hc->bwnc", hdn, w2,
                   preferred_element_type=jnp.float32) + b2
    )
    if return_act_amax:
        amax = jnp.stack([
            jnp.max(jnp.abs(qin.astype(jnp.float32))),
            jnp.max(jnp.abs(attn.astype(jnp.float32))),
            jnp.max(jnp.abs(z.astype(jnp.float32))),
            jnp.max(jnp.abs(hdn.astype(jnp.float32))),
        ])
        return out.astype(xw.dtype), amax
    return out.astype(xw.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused(num_heads, eps, wblk, ib, pad_gemm, nopad, quant, interpret):
    @jax.custom_vjp
    def f(xw, *params):
        return _pallas_impl(xw, *params, num_heads=num_heads, eps=eps,
                            wblk=wblk, ib=ib, pad_gemm=pad_gemm, nopad=nopad,
                            quant=quant, interpret=interpret)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        xw, *params = res

        def body(xw_, *ps):
            return xla_equivalent(xw_, *ps, num_heads=num_heads, eps=eps)

        _, vjp = jax.vjp(body, xw, *params)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_swin_block_windows(
    xw: jnp.ndarray,                   # (B, nW, ws*ws, C) windows, RAW
    ln0_scale, ln0_bias,               # (C,) f32
    w_qkv, b_qkv, w_proj, b_proj,      # attention projections
    ln1_scale, ln1_bias,               # (C,) f32
    w1, b1, w2, b2,                    # MLP
    bias_pad: jnp.ndarray,             # (nW, h, npad, npad) f32 (pad-masked)
    num_heads: int,
    *,
    block_windows: Optional[int] = None,
    image_block: Optional[int] = None,
    pad_gemm: Optional[bool] = None,
    quant=False,                       # W8A8 int8 GEMMs (pad flavor only):
    #   True = dynamic (weights re-quantized per grid program — measured
    #   +9.5% LOSS, docs/ROOFLINE.md §6); "static" = pre-quantized int8
    #   weights + wscales (+ optional calibrated act_scales) — serving
    #   only, no VJP
    wscales=None,                      # static: 4 f32 (n_out,) scale vectors
    act_scales=None,                   # static: 4 Python-float act scales
    ln_eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One whole Swin block on (unpadded) windows — differentiable.

    pad_gemm selects the flavor: True = pad windows to a sublane tile in
    VMEM and run every GEMM as one large-M matmul; False = per-window
    GEMMs, no padding. Measured end-to-end (ab_bench swin, back-to-back):
    the pad flavor wins at C>=256; at C<=192 BOTH flavors lose to the
    attention-only kernel + separate large-M fused MLP (the per-window
    MLP GEMM chain is latency-bound), so SwinBlock only routes wide
    stages here. Default: auto by width (MMRP_SWIN_PAD_MINC=256)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, nW, _, C = xw.shape
    npad = bias_pad.shape[-1]
    if pad_gemm is None:
        pad_gemm = C >= int(os.environ.get("MMRP_SWIN_PAD_MINC", "256"))
    if block_windows is None:
        block_windows = int(os.environ.get("MMRP_SWBLK", "8"))
    wblk_eff = min(block_windows, nW)
    if image_block is None:
        # target >= ~448 GEMM rows per program so the MXU sees large M even
        # at late stages (stage 4: nW=1 -> 8 images per program).
        # MMRP_SWIB_<C> overrides ONE width without confounding the other
        # stages (each stage computes its own default from its geometry).
        image_block = int(os.environ.get(
            f"MMRP_SWIB_{C}",
            os.environ.get("MMRP_SWIB",
                           str(max(1, 448 // (wblk_eff * npad))))))
    # Unpadded large-M flavor (see _pallas_impl) is the DEFAULT: measured
    # back-to-back on the Swin-B encoder (B=64) it wins 26.98 vs 28.62 ms
    # (-5.7%) — Mosaic's non-tile-aligned relayout costs less than the
    # +14% pad-row GEMM FLOPs it removes. MMRP_SWIN_NOPAD=0 restores the
    # padded flavor; ib selection above stays on the padded npad so the
    # grid geometry matches the tuned defaults (rows 448 -> 392).
    nopad = os.environ.get("MMRP_SWIN_NOPAD", "1") == "1"
    if quant == "static":
        # serving-only path (no VJP): weights arrive pre-quantized int8 —
        # the custom-VJP recompute body (xla_equivalent) needs float
        # weights, and grads through a post-training-quantized block are
        # meaningless anyway
        return _pallas_impl(
            xw, ln0_scale, ln0_bias, w_qkv, b_qkv, w_proj, b_proj,
            ln1_scale, ln1_bias, w1, b1, w2, b2, bias_pad,
            num_heads=num_heads, eps=float(ln_eps), wblk=int(block_windows),
            ib=int(image_block), pad_gemm=True, nopad=nopad, quant="static",
            interpret=bool(interpret), wscales=wscales,
            act_scales=act_scales)
    fn = _make_fused(num_heads, float(ln_eps), int(block_windows),
                     int(image_block), bool(pad_gemm), bool(nopad),
                     bool(quant and pad_gemm), bool(interpret))
    return fn(xw, ln0_scale, ln0_bias, w_qkv, b_qkv, w_proj, b_proj,
              ln1_scale, ln1_bias, w1, b1, w2, b2, bias_pad)
