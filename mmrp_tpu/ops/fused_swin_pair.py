"""Stage-pair Pallas kernel: a W-MSA block + its shifted partner in ONE
VMEM residency (VERDICT r4 #6 — the stage-2 below-roof kernel).

Swin stages interleave non-shifted and shifted blocks (reference: timm
swin consumed via /root/reference/src/Model/fusion.py:92; repo XLA oracle
models/swin.py::SwinBlock). Executed separately — even with each block
fully fused (ops/fused_swin_block.py) — the feature map makes one HBM
round trip PER BLOCK, plus the XLA-side roll/partition/reverse copies
between them. At Swin-B stage 2 (28x28x256) the per-block kernel measured
68 TF/s against the 104 TF/s stage-3 figure, and the per-op trace pins
part of the 3.7 ms copy share on the inter-block relayouts.

This kernel runs BOTH blocks per grid program with the map resident in
VMEM the whole time: partition -> block0 -> reverse -> roll(-s) ->
partition -> block1 (shifted bias/mask) -> reverse -> roll(+s) -> one
HBM write. Window partition/reverse and the rolls become in-VMEM
reshapes/concats; GEMM rows double to ib*nW*N (784 at stage 2, ib=1),
amortizing the small-K (C=256) pipeline latency across more M.

VMEM budget gates applicability: both blocks' weights + two bias tables
+ the map must fit (~9 MB at stage 2 bf16; stage 4's C=1024 pair would
need ~25 MB — not eligible). The caller (models/swin.py) pairs only
stages where `pair_vmem_ok` says yes.

quant="static" mirrors the whole-block static W8A8 flavor (pre-quantized
int8 weights + per-out-channel scales + calibrated per-tensor activation
scales; models/quant_calib.py). Differentiable via custom VJP (XLA
recompute) for the float flavor only — static int8 is serving-only.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mmrp_tpu.ops.fused_swin_block import _block_body, xla_equivalent

try:  # pragma: no cover - exercised on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def pair_vmem_ok(C: int, H: int, W: int, num_heads: int, ws: int,
                 mlp_ratio: float = 4.0,
                 budget_bytes: int = 12 * 1024 * 1024,
                 weight_bytes: int = 2) -> bool:
    """Conservative VMEM feasibility check for one (ib=1) pair program:
    map + both blocks' weights + both bias tables + the largest live
    intermediates (qkv rows + one head's f32 scores + hidden rows).

    ``weight_bytes``: 2 for bf16 weights, 1 for the static-int8 flavor —
    pre-quantized weights halve the resident footprint, which is exactly
    what makes the Swin-B C=512 stage (18 blocks, the largest single op
    group in the serving trace) pair-eligible under int8 while its bf16
    pair (12.6 MB of weights alone) is not (~16 MB VMEM/core)."""
    hidden = int(C * mlp_ratio)
    nW = (H // ws) * (W // ws)
    N = ws * ws
    per_block = 3 * C * C + C * C + 2 * C * hidden
    wbytes = 2 * weight_bytes * per_block                  # 2 blocks
    if weight_bytes == 1:                                  # dequant scales
        wbytes += 2 * 4 * (3 * C + C + hidden + C)
    bias = 2 * 4 * nW * num_heads * N * N                  # f32
    xmap = 2 * H * W * C * 3                               # in/out/mid bf16
    inter = 2 * nW * N * 3 * C + 4 * nW * N * N + 2 * nW * N * hidden
    return wbytes + bias + xmap + inter <= budget_bytes


def _partition(xm, ws):                    # (ib,H,W,C) -> (ib,nW,N,C)
    ib, H, W, C = xm.shape
    nWh, nWw = H // ws, W // ws
    x6 = xm.reshape(ib, nWh, ws, nWw, ws, C)
    return x6.transpose(0, 1, 3, 2, 4, 5).reshape(ib, nWh * nWw, ws * ws, C)


def _reverse(x4, ws, H, W):                # (ib,nW,N,C) -> (ib,H,W,C)
    ib, _, _, C = x4.shape
    nWh, nWw = H // ws, W // ws
    x6 = x4.reshape(ib, nWh, nWw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x6.reshape(ib, H, W, C)


def _roll2(xm, s):                         # jnp.roll by (s, s) on (H, W)
    H, W = xm.shape[1], xm.shape[2]
    s_h, s_w = s % H, s % W
    if s_h:
        xm = jnp.concatenate([xm[:, H - s_h:], xm[:, :H - s_h]], axis=1)
    if s_w:
        xm = jnp.concatenate(
            [xm[:, :, W - s_w:], xm[:, :, :W - s_w]], axis=2)
    return xm


def _pair_kernel(x_ref, *refs, num_heads: int, scale: float, eps: float,
                 ws: int, shift: int, quant, act_scales0=None,
                 act_scales1=None):
    # refs layout: 12 block0 params, bias0, 12 block1 params, bias1,
    # [4 scale vecs block0, 4 scale vecs block1 when static], o_ref
    b0 = refs[0:12]
    bias0_ref = refs[12]
    b1 = refs[13:25]
    bias1_ref = refs[25]
    if quant == "static":
        s0 = refs[26:30]
        s1 = refs[30:34]
        o_ref = refs[34]
    else:
        s0 = s1 = None
        o_ref = refs[26]
    ib, H, W, C = x_ref.shape
    N = ws * ws

    body = functools.partial(_block_body, num_heads=num_heads, scale=scale,
                             eps=eps, npad=N, quant=quant)

    y4 = body(_partition(x_ref[...], ws), *b0, bias0_ref,
              scale_refs=s0, act_scales=act_scales0)
    ym = _roll2(_reverse(y4, ws, H, W), -shift)
    z4 = body(_partition(ym, ws), *b1, bias1_ref,
              scale_refs=s1, act_scales=act_scales1)
    o_ref[...] = _roll2(_reverse(z4, ws, H, W), shift)


def _pallas_impl_pair(x, blk0, bias0, blk1, bias1, *, num_heads, eps, ws,
                      shift, ib, quant, wscales0=None, wscales1=None,
                      act_scales0=None, act_scales1=None, interpret=False):
    B, H, W, C = x.shape
    nW = (H // ws) * (W // ws)
    N = ws * ws
    hidden = blk0[8].shape[1]
    d = C // num_heads
    scale = d**-0.5
    while ib > 1 and B % ib:
        ib //= 2
    ib = max(ib, 1)

    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) \
        else {}
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * (2 * B * nW * N * C * (4 * C + 2 * hidden)
                       + 4 * B * nW * num_heads * N * N * d),
            bytes_accessed=2 * B * H * W * C * 2
            + 4 * (4 * C * C + 2 * C * hidden),
            transcendentals=2 * B * nW * num_heads * N * N,
        )

    def wspecs():
        return [
            pl.BlockSpec((C,), lambda b: (0,), **vm),
            pl.BlockSpec((C,), lambda b: (0,), **vm),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0), **vm),
            pl.BlockSpec((3 * C,), lambda b: (0,), **vm),
            pl.BlockSpec((C, C), lambda b: (0, 0), **vm),
            pl.BlockSpec((C,), lambda b: (0,), **vm),
            pl.BlockSpec((C,), lambda b: (0,), **vm),
            pl.BlockSpec((C,), lambda b: (0,), **vm),
            pl.BlockSpec((C, hidden), lambda b: (0, 0), **vm),
            pl.BlockSpec((hidden,), lambda b: (0,), **vm),
            pl.BlockSpec((hidden, C), lambda b: (0, 0), **vm),
            pl.BlockSpec((C,), lambda b: (0,), **vm),
        ]

    bias_spec = pl.BlockSpec((nW, num_heads, N, N), lambda b: (0, 0, 0, 0),
                             **vm)
    in_specs = (
        [pl.BlockSpec((ib, H, W, C), lambda b: (b, 0, 0, 0), **vm)]
        + wspecs() + [bias_spec] + wspecs() + [bias_spec]
    )
    args = [x, *blk0, bias0[:, :, :N, :N], *blk1, bias1[:, :, :N, :N]]
    if quant == "static":
        for sv, n_out in zip(
                list(wscales0) + list(wscales1),
                (3 * C, C, hidden, C) * 2):
            if sv.shape != (n_out,):
                raise ValueError(
                    f"weight scale shape {sv.shape} != ({n_out},)")
            in_specs.append(pl.BlockSpec((n_out,), lambda b: (0,), **vm))
            args.append(sv)

    kernel = functools.partial(
        _pair_kernel, num_heads=num_heads, scale=scale, eps=eps, ws=ws,
        shift=shift, quant=quant, act_scales0=act_scales0,
        act_scales1=act_scales1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B // ib,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ib, H, W, C), lambda b: (b, 0, 0, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(*args)


def _xla_pair(x, blk0, bias0, blk1, bias1, *, num_heads, eps, ws, shift):
    """Oracle/VJP body: two sequential whole-block XLA computations with
    the roll between them (matches SwinBlock's sequential semantics)."""
    from mmrp_tpu.ops.window_attention import window_partition, window_reverse

    H, W = x.shape[1], x.shape[2]
    y = window_reverse(
        xla_equivalent(window_partition(x, ws), *blk0, bias0,
                       num_heads=num_heads, eps=eps), ws, H, W)
    ys = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
    z = window_reverse(
        xla_equivalent(window_partition(ys, ws), *blk1, bias1,
                       num_heads=num_heads, eps=eps), ws, H, W)
    return jnp.roll(z, shift=(shift, shift), axis=(1, 2))


@functools.lru_cache(maxsize=None)
def _make_pair(num_heads, eps, ws, shift, ib, interpret):
    @jax.custom_vjp
    def f(x, *params):  # params: 12 blk0, bias0, 12 blk1, bias1
        blk0, bias0 = params[0:12], params[12]
        blk1, bias1 = params[13:25], params[25]
        return _pallas_impl_pair(
            x, blk0, bias0, blk1, bias1, num_heads=num_heads, eps=eps,
            ws=ws, shift=shift, ib=ib, quant=False, interpret=interpret)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        x, *params = res

        def body(x_, *ps):
            return _xla_pair(x_, ps[0:12], ps[12], ps[13:25], ps[25],
                             num_heads=num_heads, eps=eps, ws=ws,
                             shift=shift)

        _, vjp = jax.vjp(body, x, *params)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_swin_block_pair(
    x: jnp.ndarray,                      # (B, H, W, C) raw feature map
    blk0: Tuple[jnp.ndarray, ...],       # 12 arrays (fused_swin_block order)
    bias0: jnp.ndarray,                  # (nW, h, npad, npad) from
    blk1: Tuple[jnp.ndarray, ...],       # build_bias_padded (shift=0 / s)
    bias1: jnp.ndarray,
    num_heads: int,
    ws: int,
    shift: int,
    *,
    quant=False,                         # False | "static" (W8A8, no VJP)
    wscales0=None,
    wscales1=None,
    act_scales0=None,
    act_scales1=None,
    ln_eps: float = 1e-6,
    image_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if image_block is None:
        image_block = int(os.environ.get("MMRP_SWPAIR_IB", "1"))
    if quant == "static":
        return _pallas_impl_pair(
            x, blk0, bias0, blk1, bias1, num_heads=num_heads,
            eps=float(ln_eps), ws=ws, shift=shift, ib=int(image_block),
            quant="static", wscales0=wscales0, wscales1=wscales1,
            act_scales0=act_scales0, act_scales1=act_scales1,
            interpret=bool(interpret))
    fn = _make_pair(num_heads, float(ln_eps), int(ws), int(shift),
                    int(image_block), bool(interpret))
    return fn(x, *blk0, bias0, *blk1, bias1)


# ---------------------------------------------------------------------------
# Roll-chain flavor: ONE block per program on the raw map, with the roll
# that prepares the NEXT block's frame applied in-VMEM before the HBM
# write. Consecutive blocks of a stage then chain custom-call ->
# custom-call with ZERO XLA ops between them — the reverse+roll+partition
# relayout "copy" ops the serving trace attributes ~3 ms/forward to
# (docs/ROOFLINE.md §6 round-4 trace) never exist. Unlike the pair
# kernel, only ONE block's weights are resident, so this stays
# VMEM-eligible at C=512/1024 where the pair was a measured loss.
# ---------------------------------------------------------------------------


def chain_vmem_ok(C: int, H: int, W: int, num_heads: int, ws: int,
                  mlp_ratio: float = 4.0,
                  budget_bytes: int = 12 * 1024 * 1024,
                  weight_bytes: int = 2) -> bool:
    """Single-block variant of pair_vmem_ok (one weight set, one bias)."""
    hidden = int(C * mlp_ratio)
    nW = (H // ws) * (W // ws)
    N = ws * ws
    wbytes = weight_bytes * (3 * C * C + C * C + 2 * C * hidden)
    if weight_bytes == 1:
        wbytes += 4 * (3 * C + C + hidden + C)
    bias = 4 * nW * num_heads * N * N
    xmap = 2 * H * W * C * 3
    inter = 2 * nW * N * 3 * C + 4 * nW * N * N + 2 * nW * N * hidden
    return wbytes + bias + xmap + inter <= budget_bytes


def _chain_kernel(x_ref, *refs, num_heads: int, scale: float, eps: float,
                  ws: int, roll_after: int, quant, act_scales=None):
    # refs layout: 12 block params, bias, [4 scale vecs], o_ref
    b = refs[0:12]
    bias_ref = refs[12]
    if quant == "static":
        s = refs[13:17]
        o_ref = refs[17]
    else:
        s = None
        o_ref = refs[13]
    ib, H, W, C = x_ref.shape
    N = ws * ws
    y4 = _block_body(_partition(x_ref[...], ws), *b, bias_ref,
                     num_heads=num_heads, scale=scale, eps=eps, npad=N,
                     quant=quant, scale_refs=s, act_scales=act_scales)
    o_ref[...] = _roll2(_reverse(y4, ws, H, W), roll_after)


def _pallas_impl_chain(x, blk, bias, *, num_heads, eps, ws, roll_after, ib,
                       quant, wscales=None, act_scales=None,
                       interpret=False):
    B, H, W, C = x.shape
    nW = (H // ws) * (W // ws)
    N = ws * ws
    hidden = blk[8].shape[1]
    d = C // num_heads
    scale = d**-0.5
    while ib > 1 and B % ib:
        ib //= 2
    ib = max(ib, 1)

    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) \
        else {}
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * nW * N * C * (4 * C + 2 * hidden)
            + 4 * B * nW * num_heads * N * N * d,
            bytes_accessed=2 * B * H * W * C * 2
            + 2 * (4 * C * C + 2 * C * hidden),
            transcendentals=B * nW * num_heads * N * N,
        )

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b: (0,) * nd), **vm)

    in_specs = [pl.BlockSpec((ib, H, W, C), lambda b: (b, 0, 0, 0), **vm)]
    for shape in ((C,), (C,), (C, 3 * C), (3 * C,), (C, C), (C,), (C,),
                  (C,), (C, hidden), (hidden,), (hidden, C), (C,)):
        in_specs.append(wspec(shape))
    in_specs.append(wspec((nW, num_heads, N, N)))
    args = [x, *blk, bias[:, :, :N, :N]]
    if quant == "static":
        for sv, n_out in zip(wscales, (3 * C, C, hidden, C)):
            if sv.shape != (n_out,):
                raise ValueError(
                    f"weight scale shape {sv.shape} != ({n_out},)")
            in_specs.append(wspec((n_out,)))
            args.append(sv)

    kernel = functools.partial(
        _chain_kernel, num_heads=num_heads, scale=scale, eps=eps, ws=ws,
        roll_after=roll_after, quant=quant, act_scales=act_scales)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B // ib,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ib, H, W, C), lambda b: (b, 0, 0, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(*args)


def _xla_chain(x, blk, bias, *, num_heads, eps, ws, roll_after):
    """Oracle/VJP body (same semantics in plain XLA)."""
    from mmrp_tpu.ops.window_attention import window_partition, window_reverse

    H, W = x.shape[1], x.shape[2]
    y = window_reverse(
        xla_equivalent(window_partition(x, ws), *blk, bias,
                       num_heads=num_heads, eps=eps), ws, H, W)
    return jnp.roll(y, shift=(roll_after, roll_after), axis=(1, 2))


@functools.lru_cache(maxsize=None)
def _make_chain(num_heads, eps, ws, roll_after, ib, interpret):
    @jax.custom_vjp
    def f(x, *params):  # params: 12 blk, bias
        return _pallas_impl_chain(
            x, params[0:12], params[12], num_heads=num_heads, eps=eps,
            ws=ws, roll_after=roll_after, ib=ib, quant=False,
            interpret=interpret)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        x, *params = res

        def body(x_, *ps):
            return _xla_chain(x_, ps[0:12], ps[12], num_heads=num_heads,
                              eps=eps, ws=ws, roll_after=roll_after)

        _, vjp = jax.vjp(body, x, *params)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_swin_block_chain(
    x: jnp.ndarray,                      # (B, H, W, C) map, PRE-rolled for
    #                                      THIS block's frame
    blk: Tuple[jnp.ndarray, ...],        # 12 arrays (fused_swin_block order)
    bias: jnp.ndarray,                   # (nW, h, npad, npad) for this
    #                                      block's shift
    num_heads: int,
    ws: int,
    roll_after: int,                     # this_shift - next_shift: the roll
    #                                      that puts the map in the NEXT
    #                                      block's frame (0 restores/none)
    *,
    quant=False,                         # False | "static" (W8A8, no VJP)
    wscales=None,
    act_scales=None,
    ln_eps: float = 1e-6,
    image_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if image_block is None:
        nW = (x.shape[1] // ws) * (x.shape[2] // ws)
        image_block = int(os.environ.get(
            "MMRP_SWCHAIN_IB", str(max(1, 448 // (nW * ws * ws)))))
    if quant == "static":
        return _pallas_impl_chain(
            x, blk, bias, num_heads=num_heads, eps=float(ln_eps), ws=ws,
            roll_after=int(roll_after), ib=int(image_block), quant="static",
            wscales=wscales, act_scales=act_scales,
            interpret=bool(interpret))
    fn = _make_chain(num_heads, float(ln_eps), int(ws), int(roll_after),
                     int(image_block), bool(interpret))
    return fn(x, *blk, bias)
