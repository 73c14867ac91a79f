"""Windowed (Swin) attention for TPU — XLA path + Pallas kernel.

The reference gets Swin window attention from timm's CUDA/PyTorch kernels
(reference: src/Model/fusion.py:189-253 consumes timm
``swin_base_patch4_window7_224`` features). Here the op is first-class:

- ``window_partition`` / ``window_reverse`` — (B, H, W, C) <-> windows,
  including the cyclic shift for Swin's shifted blocks;
- a single **static combined bias** per (layer shape): relative-position
  bias + shifted-window mask + sequence padding fold into one
  (num_heads * num_windows, N_pad, N_pad) tensor at init, so the hot path
  is exactly two batched matmuls + softmax with one additive term;
- ``window_attention_xla`` — einsum formulation XLA fuses well;
- ``window_attention_pallas`` — a Pallas kernel that keeps q/k/v blocks and
  the bias tile in VMEM and processes a block of head-windows per grid step
  (N=49 padded to 64 so the MXU tiles cleanly; head_dim is 32 for every
  Swin stage).

Layout contract: q, k, v are (B, G, N_pad, D) where G = num_heads *
num_windows and bias2 is (G, N_pad, N_pad). The caller fixes the window
count per stage, so everything is static under jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (kernels run in interpret mode there)
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


# ---------------------------------------------------------------------------
# Window partition / reverse
# ---------------------------------------------------------------------------


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nW, ws*ws, C) with row-major window order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // ws) * (W // ws), ws * ws, C)


def window_reverse(x: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B, nW, ws*ws, C) -> (B, H, W, C)."""
    B, nW, N, C = x.shape
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# Static bias construction
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def relative_position_index(ws: int) -> np.ndarray:
    """(N, N) indices into the (2*ws-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return (rel[:, :, 0] + rel[:, :, 1]).astype(np.int32)  # (N, N)


@functools.lru_cache(maxsize=None)
def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (0 / -1e9) for shifted-window attention."""
    img = np.zeros((H, W), dtype=np.int32)
    cnt = 0
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = h_slices
    for hs in h_slices:
        for ws_ in w_slices:
            img[hs, ws_] = cnt
            cnt += 1
    img = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = img.reshape(-1, ws * ws)  # (nW, N)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


def build_rel_bias(rel_bias_table: jnp.ndarray, ws: int) -> jnp.ndarray:
    """((2ws-1)^2, h) learned table -> (h, N, N) additive bias."""
    N = ws * ws
    idx = jnp.asarray(relative_position_index(ws).reshape(-1))
    return rel_bias_table[idx].reshape(N, N, -1).transpose(2, 0, 1)


def build_combined_bias(
    rel_bias_table: jnp.ndarray,  # ((2ws-1)^2, num_heads) learned parameter
    ws: int,
    H: int,
    W: int,
    shift: int,
    n_pad: int,
) -> jnp.ndarray:
    """Fold relative bias + shift mask + padding into (G, N_pad, N_pad).

    G = num_heads * num_windows, ordered head-major then window so a
    contiguous block shares a head's bias table (friendlier VMEM reuse).
    """
    N = ws * ws
    nW = (H // ws) * (W // ws)
    rel = build_rel_bias(rel_bias_table, ws)  # (h, N, N)
    num_heads = rel.shape[0]

    if shift > 0:
        smask = jnp.asarray(shift_attn_mask(H, W, ws, shift))  # (nW, N, N)
    else:
        smask = jnp.zeros((nW, N, N), dtype=jnp.float32)

    bias = rel[:, None, :, :] + smask[None, :, :, :]  # (h, nW, N, N)
    bias = bias.reshape(num_heads * nW, N, N)

    if n_pad > N:
        pad = n_pad - N
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
        # padded key columns must never receive attention
        col_mask = jnp.concatenate(
            [jnp.zeros(N, jnp.float32), jnp.full((pad,), -1e9, jnp.float32)]
        )
        bias = bias + col_mask[None, None, :]
    return bias


# ---------------------------------------------------------------------------
# XLA attention path
# ---------------------------------------------------------------------------


def window_attention_xla_direct(
    qkv_win: jnp.ndarray,  # (B, nW, N, 3, h, d) — natural window layout
    rel_bias: jnp.ndarray,  # (h, N, N)
    smask: Optional[jnp.ndarray],  # (nW, N, N) or None
    scale: float,
    scores_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Attention on the un-padded, un-transposed window layout.

    Lets XLA contract directly over (B, nW) batch dims: no 49->64 padding
    (-23% FLOPs) and no head-major relayout of the activations. Scores
    materialize in the input dtype by default — at stage-1 shapes the score
    tensor is the single largest HBM stream of the whole encoder
    (B*64*3*49*49; f32 doubles it), and 49-row softmax with max-subtraction
    is well-conditioned in bf16. Pass scores_dtype=jnp.float32 for the
    high-precision variant. Returns (B, nW, N, h*d).
    """
    q = qkv_win[..., 0, :, :]  # (B, nW, N, h, d)
    k = qkv_win[..., 1, :, :]
    v = qkv_win[..., 2, :, :]
    sdt = scores_dtype or q.dtype
    scores = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k, preferred_element_type=sdt)
    scores = scores * jnp.asarray(scale, sdt) + rel_bias[None, None].astype(sdt)
    if smask is not None:
        scores = scores + smask[None, :, None].astype(sdt)
    # max-subtracted softmax; reductions in f32 regardless of score dtype
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32))
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", p, v)
    B, nW, N, h, d = out.shape
    return out.reshape(B, nW, N, h * d)


def window_attention_xla_6d(
    qkv6: jnp.ndarray,  # (B, nWh, ws, nWw, ws, 3, h, d)
    rel_bias: jnp.ndarray,  # (h, N, N)
    smask: Optional[jnp.ndarray],  # (nW, N, N) or None
    scale: float,
    ws: int,
    scores_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Attention on the UN-PARTITIONED 6D view — the no-copy formulation.

    ``qkv6`` is a pure reshape of the (B, H, W, 3C) qkv map: H = nWh*ws
    and W = nWw*ws split contiguously, so neither this reshape nor the
    inverse on the output moves data — the explicit window partition /
    reverse transposes (the dominant copy cost of the XLA train path,
    docs/ROOFLINE.md §8: 18% of the Swin-B step) never appear in the
    graph. Whether XLA's dot_general lowers the interleaved batch dims
    (b, i, j, h) without materializing equivalent relayouts is a measured
    question — gated by MMRP_SWIN_XLA_6D in WindowAttention.

    Numerics mirror :func:`window_attention_xla_direct`: scores in the
    input dtype by default, max-subtracted softmax with f32 reductions.
    Returns (B, nWh, ws, nWw, ws, h*d); reshape to (B, H, W, C) is pure.
    """
    q = qkv6[..., 0, :, :]  # (b, i, p, j, q, h, d)
    k = qkv6[..., 1, :, :]
    v = qkv6[..., 2, :, :]
    h = q.shape[-2]
    sdt = scores_dtype or q.dtype
    scores = jnp.einsum("bipjqhd,biPjQhd->bijhpqPQ", q, k,
                        preferred_element_type=sdt)
    rel6 = rel_bias.reshape(h, ws, ws, ws, ws)
    scores = scores * jnp.asarray(scale, sdt) \
        + rel6[None, None, None].astype(sdt)
    if smask is not None:
        nWh, nWw = q.shape[1], q.shape[3]
        sm6 = smask.reshape(nWh, nWw, ws, ws, ws, ws)
        scores = scores + sm6[None, :, :, None].astype(sdt)
    m = jnp.max(scores, axis=(-2, -1), keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32))
    p = (e / jnp.sum(e, axis=(-2, -1), keepdims=True)).astype(v.dtype)
    out = jnp.einsum("bijhpqPQ,biPjQhd->bipjqhd", p, v)
    B, nWh, _, nWw, _, h, d = out.shape
    return out.reshape(B, nWh, ws, nWw, ws, h * d)


def window_attention_xla(
    q: jnp.ndarray,  # (B, G, N_pad, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias2: jnp.ndarray,  # (G, N_pad, N_pad)
    scale: float,
) -> jnp.ndarray:
    scores = jnp.einsum(
        "bgnd,bgmd->bgnm", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale + bias2[None].astype(jnp.float32)
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bgnm,bgmd->bgnd", p, v)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _wattn_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    # blocks: q/k/v (1, HB, N, D); bias (HB, N, N)
    q = q_ref[0]  # (HB, N, D)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (HB, N, N)
    scores = scores * scale + b_ref[...].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def window_attention_pallas(
    q: jnp.ndarray,  # (B, G, N_pad, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias2: jnp.ndarray,  # (G, N_pad, N_pad)
    scale: float,
    block_g: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    B, G, N, D = q.shape
    if G % block_g != 0:
        block_g = 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (B, G // block_g)
    blk_qkv = pl.BlockSpec(
        (1, block_g, N, D),
        lambda b, g: (b, g, 0, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU and not interpret else None,
    )
    blk_bias = pl.BlockSpec(
        (block_g, N, N),
        lambda b, g: (g, 0, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU and not interpret else None,
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=4 * B * G * N * N * D,
            bytes_accessed=(3 * B * G * N * D + G * N * N + B * G * N * D) * 2,
            transcendentals=B * G * N * N,
        )
    return pl.pallas_call(
        functools.partial(_wattn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, G, N, D), q.dtype),
        grid=grid,
        in_specs=[blk_qkv, blk_qkv, blk_qkv, blk_bias],
        out_specs=blk_qkv,
        interpret=interpret,
        **kwargs,
    )(q, k, v, bias2)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias2: jnp.ndarray,
    scale: float,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Dispatch to the Pallas kernel on TPU, XLA einsum elsewhere."""
    if use_pallas and jax.default_backend() == "tpu":
        return window_attention_pallas(q, k, v, bias2, scale)
    return window_attention_xla(q, k, v, bias2, scale)
