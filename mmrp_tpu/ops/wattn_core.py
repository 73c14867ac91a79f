"""Raw-layout window-attention CORE with a hand-written backward kernel.

Motivation (docs/ROOFLINE.md §8): the flagship (Swin-B) TRAIN step is
FLOP-floored on its GEMMs, but 18% of device time (44.8 ms of 222 at b64)
is layout copies — window partition/reverse transposes, the cyclic-shift
rolls, and the softmax tensors XLA stores for the backward. Every XLA
reformulation tried (6D no-copy view, partition-before-qkv) LOST because
the copies reappear as worse layouts; the whole-block Pallas kernels lose
in training because their custom VJP recomputes the full forward. The fix
this op implements: keep the qkv/proj GEMMs in XLA (they run AT the
measured roof, §8) and fuse ONLY the layout-sensitive middle —

    (B, H, W, 3C) raw qkv map
      -> [in VMEM] cyclic shift roll -> window partition -> per-head
         attention with combined bias -> window reverse -> unroll
      -> (B, H, W, C) raw attention output

with a REAL backward kernel (same VMEM residency) that recomputes the
softmax from the saved qkv map (~6% extra FLOPs: scores are O(N*C) per
token vs the O(3C^2) qkv GEMM) and emits dqkv in raw layout plus the
per-window bias gradient. Net effect on the train step: the partition /
reverse / roll copies never exist in EITHER direction, and the attention
probabilities are never materialized to HBM for the backward.

The reference takes this op from timm's CUDA kernels + torch autograd
(reference: src/Model/fusion.py:92 swin_base_patch4_window7_224); the
layout problem it solves does not exist there because cuDNN attention
consumes the windowed layout directly.

Layout contract
---------------
qkv  : (B, H, W, 3C) — the raw qkv GEMM output, [q | k | v] along the
       last axis, each C = num_heads * head_dim with heads contiguous
       (the models/swin.py qkv Dense layout).
bias : (nW, num_heads, N, N) f32 — relative-position bias + shift mask
       (ops/fused_window_attention.build_bias_full), differentiable.
out  : (B, H, W, C).

Gated by MMRP_SWIN_CORE in models/swin.py::WindowAttention (training/XLA
branch): default ON on TPU — measured back-to-back on the Swin-B b64
train step 201.1 vs 242.4 ms (+20.5% pairs/s, loss equal to 4 decimals;
the per-op copy share fell 44.8 -> ~12 ms), BENCH_TRAIN_FLAGSHIP.json —
and OFF elsewhere (interpret mode is for tests). Numerics oracle:
tests/test_wattn_core.py compares forward and gradients against the
composed XLA path.

Multi-chip note: the grid maps over the batch dimension only, so under a
device mesh the op is dp-shardable by running the train step inside
``shard_map`` (per-shard shapes reach the kernel unchanged). Plain GSPMD
jit on a >1-chip mesh should keep MMRP_SWIN_CORE=0 (custom calls do not
auto-partition); the CPU dryrun path defaults off already.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports on CPU too; kernels run in interpret mode there
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


# ---------------------------------------------------------------------------
# In-VMEM layout helpers (shapes are static; these trace into the kernels)
# ---------------------------------------------------------------------------


def _pad_lanes(x: jnp.ndarray, mult: int = 128) -> jnp.ndarray:
    """Zero-pad the trailing (lane) dim to a multiple of ``mult``.

    Mosaic's shape-cast inference rejects the window-split reshape when
    the lane dim is not 128-aligned (Swin-T stages 1-2: 3C = 288/576,
    "unsupported shape cast"); padding in VMEM before the reshape lifts
    that, and the pad lanes are never read (per-head slices stay below
    the true C) — only the merge direction slices them off again."""
    pad = (-x.shape[-1]) % mult
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _win_split(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(bb, H, W, F) -> (bb*nW, N, F), row-major window order."""
    bb, H, W, F = x.shape
    x = x.reshape(bb, H // ws, ws, W // ws, ws, F)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(bb * (H // ws) * (W // ws), ws * ws, F)


def _win_merge(x: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(bb*nW, N, F) -> (bb, H, W, F)."""
    nb, N, F = x.shape
    bb = nb // ((H // ws) * (W // ws))
    x = x.reshape(bb, H // ws, W // ws, ws, ws, F)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(bb, H, W, F)


def _heads_pnp(qkv3: jnp.ndarray, bias_ref, do3, *, num_heads: int,
               scale: float, bb: int, C: Optional[int] = None):
    """Per-head generator shared by fwd/bwd: yields
    (head, q, k, v, p, do_h) with p the f32 softmax probabilities.
    ``do3`` may be None (forward). ``C`` must be passed when qkv3's lane
    dim carries _pad_lanes zeros (then lane_dim // 3 would be wrong)."""
    nb, N, C3 = qkv3.shape
    if C is None:
        C = C3 // 3
    d = C // num_heads
    nW = nb // bb
    for head in range(num_heads):
        q = qkv3[:, :, head * d:(head + 1) * d]
        k = qkv3[:, :, C + head * d:C + (head + 1) * d]
        v = qkv3[:, :, 2 * C + head * d:2 * C + (head + 1) * d]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                    # (nb, N, N) f32
        bias_h = bias_ref[:, head]                   # (nW, N, N)
        if bb > 1:
            bias_h = jnp.broadcast_to(
                bias_h[None], (bb, nW, N, N)).reshape(nb, N, N)
        scores = scores + bias_h
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # (nb, N, N) f32
        do_h = None if do3 is None else do3[:, :, head * d:(head + 1) * d]
        yield head, q, k, v, p, do_h


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(qkv_ref, bias_ref, o_ref, *, ws: int, shift: int,
                num_heads: int, scale: float):
    qkv = qkv_ref[...]                               # (bb, H, W, 3C)
    bb, H, W, C3 = qkv.shape
    C = C3 // 3
    if shift:
        qkv = jnp.roll(qkv, shift=(-shift, -shift), axis=(1, 2))
    qkv3 = _win_split(_pad_lanes(qkv), ws)           # (nb, N, 3C [+pad])

    outs = []
    for _, _, _, v, p, _ in _heads_pnp(qkv3, bias_ref, None,
                                       num_heads=num_heads, scale=scale,
                                       bb=bb, C=C):
        outs.append(
            jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(qkv.dtype)                      # (nb, N, d)
        )
    out3 = jnp.concatenate(outs, axis=-1)            # (nb, N, C)
    out = _win_merge(_pad_lanes(out3), ws, H, W)[..., :C]  # (bb, H, W, C)
    if shift:
        out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
    o_ref[...] = out


def _bwd_kernel(qkv_ref, bias_ref, do_ref, dqkv_ref, dbias_ref, *, ws: int,
                shift: int, num_heads: int, scale: float):
    qkv = qkv_ref[...]                               # (bb, H, W, 3C)
    do = do_ref[...]                                 # (bb, H, W, C)
    bb, H, W, C3 = qkv.shape
    C = C3 // 3
    nW = (H // ws) * (W // ws)
    N = ws * ws
    if shift:
        # out = unroll(f(roll(qkv))): the permutation transposes to its
        # inverse, so the cotangent rolls FORWARD (-shift) and the result
        # rolls back (+shift) — mirror of the forward's sandwich.
        qkv = jnp.roll(qkv, shift=(-shift, -shift), axis=(1, 2))
        do = jnp.roll(do, shift=(-shift, -shift), axis=(1, 2))
    qkv3 = _win_split(_pad_lanes(qkv), ws)           # (nb, N, 3C [+pad])
    do3 = _win_split(_pad_lanes(do), ws)             # (nb, N, C [+pad])

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dqs, dks, dvs = [], [], []
    for head, q, k, v, p, do_h in _heads_pnp(qkv3, bias_ref, do3,
                                             num_heads=num_heads,
                                             scale=scale, bb=bb, C=C):
        pb = p.astype(v.dtype)
        # dv = p^T do                                 (nb, Nk, d)
        dv = jax.lax.dot_general(
            pb, do_h, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dp = do v^T                                 (nb, Nq, Nk) f32
        dp = jax.lax.dot_general(
            do_h, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # softmax VJP: ds = p * (dp - sum_k dp*p)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
        dbias_ref[:, head] += ds.reshape(bb, nW, N, N).sum(axis=0)
        dsb = (ds * scale).astype(q.dtype)
        # dq = ds*scale @ k                           (nb, Nq, d)
        dqs.append(jax.lax.dot_general(
            dsb, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(qkv.dtype))
        # dk = (ds*scale)^T @ q                       (nb, Nk, d)
        dks.append(jax.lax.dot_general(
            dsb, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(qkv.dtype))
        dvs.append(dv.astype(qkv.dtype))

    dqkv3 = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (nb, N, 3C)
    dqkv = _win_merge(_pad_lanes(dqkv3), ws, H, W)[..., :C3]
    if shift:
        dqkv = jnp.roll(dqkv, shift=(shift, shift), axis=(1, 2))
    dqkv_ref[...] = dqkv


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _pick_block_b(B: int, H: int, W: int, C3: int, itemsize: int,
                  cap_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest divisor of B whose qkv block fits the VMEM budget."""
    per_b = H * W * C3 * itemsize
    bb = max(1, min(B, cap_bytes // max(per_b, 1)))
    while B % bb:
        bb -= 1
    return bb


def _vmem_kwargs(interpret: bool):
    if _HAS_PLTPU and not interpret:
        return dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )
    return {}


def _core_fwd_call(qkv, bias, *, ws, shift, num_heads, scale, interpret):
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    # budget on the lane-padded width the kernel actually materializes
    bb = _pick_block_b(B, H, W, C3 + (-C3) % 128, qkv.dtype.itemsize)
    space = pltpu.VMEM if _HAS_PLTPU and not interpret else None
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ws=ws, shift=shift,
                          num_heads=num_heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), qkv.dtype),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H, W, C3), lambda b: (b, 0, 0, 0),
                         memory_space=space),
            pl.BlockSpec(bias.shape, lambda b: (0, 0, 0, 0),
                         memory_space=space),
        ],
        out_specs=pl.BlockSpec((bb, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=space),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(qkv, bias)


def _core_bwd_call(qkv, bias, do, *, ws, shift, num_heads, scale, interpret):
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    bb = _pick_block_b(B, H, W, C3 + (-C3) % 128, qkv.dtype.itemsize)
    space = pltpu.VMEM if _HAS_PLTPU and not interpret else None
    dqkv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, ws=ws, shift=shift,
                          num_heads=num_heads, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C3), qkv.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H, W, C3), lambda b: (b, 0, 0, 0),
                         memory_space=space),
            pl.BlockSpec(bias.shape, lambda b: (0, 0, 0, 0),
                         memory_space=space),
            pl.BlockSpec((bb, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=space),
        ],
        out_specs=(
            pl.BlockSpec((bb, H, W, C3), lambda b: (b, 0, 0, 0),
                         memory_space=space),
            # constant index map: the f32 accumulator stays VMEM-resident
            # across the sequential grid and flushes once at the end
            pl.BlockSpec(bias.shape, lambda b: (0, 0, 0, 0),
                         memory_space=space),
        ),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(qkv, bias, do)
    return dqkv, dbias


@functools.lru_cache(maxsize=None)
def _make_core(ws: int, shift: int, num_heads: int, scale: float,
               interpret: bool):
    @jax.custom_vjp
    def core(qkv, bias):
        return _core_fwd_call(qkv, bias, ws=ws, shift=shift,
                              num_heads=num_heads, scale=scale,
                              interpret=interpret)

    def fwd(qkv, bias):
        # residuals are the op's own inputs — XLA keeps them alive anyway
        # (qkv feeds the proj GEMM's weight grad); nothing extra is stored,
        # and the attention probabilities never touch HBM.
        return core(qkv, bias), (qkv, bias)

    def bwd(res, do):
        qkv, bias = res
        dqkv, dbias = _core_bwd_call(qkv, bias, do, ws=ws, shift=shift,
                                     num_heads=num_heads, scale=scale,
                                     interpret=interpret)
        return dqkv, dbias

    core.defvjp(fwd, bwd)
    return core


def window_attention_core(
    qkv: jnp.ndarray,          # (B, H, W, 3C) raw qkv map
    bias: jnp.ndarray,         # (nW, h, N, N) f32 combined bias
    *,
    ws: int,
    shift: int,
    num_heads: int,
    scale: float,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable raw-layout windowed attention (see module docstring).

    Requires H % ws == 0 and W % ws == 0 (production Swin resolutions);
    callers gate on that plus nW > 1 (at nW == 1 the partition is already
    a free reshape and XLA emits no copies).
    """
    B, H, W, C3 = qkv.shape
    assert H % ws == 0 and W % ws == 0, (H, W, ws)
    assert C3 % (3 * num_heads) == 0, (C3, num_heads)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_core(ws, shift, num_heads, float(scale), bool(interpret))(
        qkv, bias)
