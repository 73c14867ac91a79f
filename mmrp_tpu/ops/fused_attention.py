"""Fused sequence-transformer attention: [LN+]QKV+MHA+proj[+res][+LN] (Pallas).

The Swin analog (ops/fused_window_attention.py) took that block to ~77% of
the HBM roof; this kernel does the same for the model's OTHER attention
consumers — the BERT text encoder (reference consumes ClinicalBERT via HF,
src/Model/fusion.py:140-156) and the fusion stack's enhancer/self/cross
attentions (src/Model/fusion.py:20-35, model.py:375-449). Measured on the
target slice (docs/ROOFLINE.md): every GEMM here is HBM-bound, so the win
is keeping the qkv tensors, attention scores, and projection input in VMEM
— per layer the unfused XLA path streams ~5x the bytes.

Supported forms (one kernel, static flags):
- ln_mode='pre':   y = [x +] proj(attn(LN(x)))          (fusion self-attn)
- ln_mode='post':  y = LN(x + proj(attn(x)))            (BERT layer)
- ln_mode='none':  y = [x +] proj(attn(x))              (fusion cross-attn)
- optional cross input kv (B, Nk, C) — else self-attention on x
- optional additive key mask (B, Nk) f32 (0 / -1e9), folded into scores

Layout rules that shaped the kernel (Mosaic): sequence lengths must be
multiples of 8 so (IB, N, C) <-> (IB*N, C) reshapes are layout-preserving
(sublane-tile aligned); callers pad tokens to 8 and fold the padding into
the key mask. Heads are static lane slices of the (rows, C) projections;
per-head attention is ONE batched 3D dot_general over the image block (the
serialized mini-matmul trap measured in round 1).

Differentiable: custom VJP recomputes through the pure-XLA equivalent
(remat — qkv/scores never persist to HBM in either pass).
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


def _ln2(xf, scale, bias, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale[None, :] + bias[None, :]


def _qdot(x, w_ref):
    """In-kernel W8A8 GEMM: per-row int8 activations x per-out-channel int8
    weights -> int32 MXU accum -> f32 dequant. Weight quantization happens
    in VMEM per program (cheap vs the GEMM; keeps the caller interface
    identical to the bf16 path)."""
    wf = w_ref[...].astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.round(wf / sw).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw


def _kernel(*refs, num_heads: int, scale: float, ln_mode: str,
            include_residual: bool, eps: float, has_kv: bool, has_mask: bool,
            has_pos: bool, has_alpha: bool, residual_from_raw: bool,
            quant: bool = False):
    it = iter(refs)
    x_ref = next(it)
    kv_ref = next(it) if has_kv else None
    mask_ref = next(it) if has_mask else None
    pos_ref = next(it) if has_pos else None
    alpha_ref = next(it) if has_alpha else None
    ln_s_ref, ln_b_ref = next(it), next(it)
    wq_ref, bq_ref = next(it), next(it)
    wk_ref, bk_ref = next(it), next(it)
    wv_ref, bv_ref = next(it), next(it)
    wo_ref, bo_ref = next(it), next(it)
    o_ref = next(it)

    IB, Nq, C = x_ref.shape
    h = num_heads
    d = C // h

    x3 = x_ref[...]                      # (IB, Nq, C)
    x2 = x3.reshape(IB * Nq, C)          # layout-preserving (Nq % 8 == 0)
    xf2 = x2.astype(jnp.float32)
    if has_pos:
        # learned/sinusoidal position table folded in: base = x + pos
        pos2 = pos_ref[...].astype(jnp.float32)          # (Nq, C)
        base2 = (xf2.reshape(IB, Nq, C) + pos2[None]).reshape(IB * Nq, C)
    else:
        base2 = xf2
    if ln_mode == "pre":
        qin = _ln2(base2, ln_s_ref[...], ln_b_ref[...], eps).astype(x2.dtype)
    else:
        qin = base2.astype(x2.dtype)
    if has_kv:
        kv3 = kv_ref[...]
        Nk = kv3.shape[1]
        kin = kv3.reshape(IB * Nk, C)
        if ln_mode == "pre":
            kin = _ln2(kin.astype(jnp.float32), ln_s_ref[...], ln_b_ref[...],
                       eps).astype(kin.dtype)
    else:
        Nk = Nq
        kin = qin

    if quant:
        q2 = (_qdot(qin, wq_ref) + bq_ref[...][None, :]).astype(x2.dtype)
        k2 = (_qdot(kin, wk_ref) + bk_ref[...][None, :]).astype(x2.dtype)
        v2 = (_qdot(kin, wv_ref) + bv_ref[...][None, :]).astype(x2.dtype)
    else:
        q2 = (jnp.dot(qin, wq_ref[...], preferred_element_type=jnp.float32)
              + bq_ref[...][None, :]).astype(x2.dtype)
        k2 = (jnp.dot(kin, wk_ref[...], preferred_element_type=jnp.float32)
              + bk_ref[...][None, :]).astype(x2.dtype)
        v2 = (jnp.dot(kin, wv_ref[...], preferred_element_type=jnp.float32)
              + bv_ref[...][None, :]).astype(x2.dtype)
    q3 = q2.reshape(IB, Nq, C)
    k3 = k2.reshape(IB, Nk, C)
    v3 = v2.reshape(IB, Nk, C)

    if has_mask:
        mbias = mask_ref[...].astype(jnp.float32)[:, None, :]  # (IB, 1, Nk)

    head_outs = []
    for head in range(h):
        sl = slice(head * d, (head + 1) * d)
        scores = jax.lax.dot_general(
            q3[:, :, sl], k3[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                        # (IB, Nq, Nk)
        if has_mask:
            scores = scores + mbias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x2.dtype)
        head_outs.append(
            jax.lax.dot_general(
                p, v3[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x2.dtype)                           # (IB, Nq, d)
        )
    attn3 = jnp.concatenate(head_outs, axis=-1)          # (IB, Nq, C)
    attn2 = attn3.reshape(IB * Nq, C)

    if quant:
        proj = _qdot(attn2, wo_ref) + bo_ref[...][None, :]
    else:
        proj = (jnp.dot(attn2, wo_ref[...], preferred_element_type=jnp.float32)
                + bo_ref[...][None, :])                   # (IB*Nq, C) f32

    if has_alpha:
        proj = proj * alpha_ref[0, 0]
    if ln_mode == "post":
        out = _ln2(base2 + proj, ln_s_ref[...], ln_b_ref[...], eps)
    elif include_residual:
        out = (xf2 if residual_from_raw else base2) + proj
    else:
        out = proj
    o_ref[...] = out.astype(x_ref.dtype).reshape(IB, Nq, C)


def xla_equivalent(
    x, kv, key_mask, ln_scale, ln_bias,
    wq, bq, wk, bk, wv, bv, wo, bo,
    *, num_heads: int, ln_mode: str = "pre", include_residual: bool = True,
    eps: float = 1e-6, return_attn: bool = False,
    pos=None, alpha=None, residual_from_raw: bool = False,
):
    """Pure-XLA computation of the SAME function (matching dtype discipline:
    f32 LN/softmax/accum, input-dtype GEMM operands). The autodiff body of
    the custom VJP, the non-TPU path, and the correctness oracle in tests.
    Optionally also returns the (B, h, Nq, Nk) f32 attention weights (the
    explainability contract of fusion.py's CrossAttention)."""
    B, Nq, C = x.shape
    h = num_heads
    d = C // h
    scale = d**-0.5

    def ln(t):
        tf = t.astype(jnp.float32)
        mu = tf.mean(-1, keepdims=True)
        var = ((tf - mu) ** 2).mean(-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(var + eps)
                * ln_scale[None, None, :] + ln_bias[None, None, :])

    xf = x.astype(jnp.float32)
    basef = xf + pos.astype(jnp.float32)[None] if pos is not None else xf
    base = basef.astype(x.dtype)
    qin = ln(base).astype(x.dtype) if ln_mode == "pre" else base
    src = kv if kv is not None else x
    kin = ln(src).astype(src.dtype) if (ln_mode == "pre" and kv is not None) \
        else (qin if kv is None else src)
    q = (jnp.einsum("bnc,ck->bnk", qin, wq,
                    preferred_element_type=jnp.float32) + bq).astype(x.dtype)
    k = (jnp.einsum("bnc,ck->bnk", kin, wk,
                    preferred_element_type=jnp.float32) + bk).astype(x.dtype)
    v = (jnp.einsum("bnc,ck->bnk", kin, wv,
                    preferred_element_type=jnp.float32) + bv).astype(x.dtype)
    Nk = k.shape[1]
    q = q.reshape(B, Nq, h, d)
    k = k.reshape(B, Nk, h, d)
    v = v.reshape(B, Nk, h, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        scores = scores + key_mask.astype(jnp.float32)[:, None, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p_f32 = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p_f32.astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.reshape(B, Nq, C)
    proj = jnp.einsum("bnc,ck->bnk", attn, wo,
                      preferred_element_type=jnp.float32) + bo
    if alpha is not None:
        proj = proj * alpha.reshape(()).astype(jnp.float32)
    if ln_mode == "post":
        pf = basef + proj
        mu = pf.mean(-1, keepdims=True)
        var = ((pf - mu) ** 2).mean(-1, keepdims=True)
        out = ((pf - mu) * jax.lax.rsqrt(var + eps)
               * ln_scale[None, None, :] + ln_bias[None, None, :])
    elif include_residual:
        out = (xf if residual_from_raw else basef) + proj
    else:
        out = proj
    out = out.astype(x.dtype)
    if return_attn:
        return out, p_f32
    return out


def _pallas_impl(x, kv, key_mask, pos, alpha,
                 ln_s, ln_b, wq, bq, wk, bk, wv, bv, wo, bo,
                 *, num_heads, ln_mode, include_residual, residual_from_raw,
                 eps, img_block, interpret, quant=False):
    B, Nq, C = x.shape
    d = C // num_heads
    scale = d**-0.5
    ib = img_block
    while ib > 1 and B % ib:
        ib //= 2
    ib = max(ib, 1)

    vm = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}
    has_kv = kv is not None
    has_mask = key_mask is not None
    has_pos = pos is not None
    has_alpha = alpha is not None
    Nk = kv.shape[1] if has_kv else Nq

    operands = [x]
    in_specs = [pl.BlockSpec((ib, Nq, C), lambda i: (i, 0, 0), **vm)]
    if has_kv:
        operands.append(kv)
        in_specs.append(pl.BlockSpec((ib, Nk, C), lambda i: (i, 0, 0), **vm))
    if has_mask:
        operands.append(key_mask.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((ib, Nk), lambda i: (i, 0), **vm))
    if has_pos:
        operands.append(pos)
        in_specs.append(pl.BlockSpec((Nq, C), lambda i: (0, 0), **vm))
    if has_alpha:
        operands.append(alpha.reshape(1, 1).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), **vm))
    for w, shape in ((ln_s, (C,)), (ln_b, (C,)),
                     (wq, (C, C)), (bq, (C,)), (wk, (C, C)), (bk, (C,)),
                     (wv, (C, C)), (bv, (C,)), (wo, (C, C)), (bo, (C,))):
        operands.append(w)
        nd = len(shape)
        in_specs.append(pl.BlockSpec(
            shape, (lambda i: (0,)) if nd == 1 else (lambda i: (0, 0)), **vm))

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * (Nq + 2 * Nk) * C * C + 2 * B * Nq * C * C
            + 4 * B * num_heads * Nq * Nk * d,
            bytes_accessed=2 * B * Nq * C * 2 + 4 * C * C * 2,
            transcendentals=B * num_heads * Nq * Nk,
        )
    return pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, scale=scale, ln_mode=ln_mode,
            include_residual=include_residual, eps=eps,
            has_kv=has_kv, has_mask=has_mask, has_pos=has_pos,
            has_alpha=has_alpha, residual_from_raw=residual_from_raw,
            quant=quant),
        out_shape=jax.ShapeDtypeStruct((B, Nq, C), x.dtype),
        grid=(B // ib,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ib, Nq, C), lambda i: (i, 0, 0), **vm),
        interpret=interpret,
        **kwargs,
    )(*operands)


@functools.lru_cache(maxsize=None)
def _make_fused(num_heads, ln_mode, include_residual, residual_from_raw,
                eps, img_block, interpret, has_kv, has_mask, has_pos,
                has_alpha, quant=False):
    """custom_vjp wrapper: Pallas forward, XLA-recompute backward (remat)."""

    @jax.custom_vjp
    def f(x, kv, key_mask, pos, alpha, *params):
        return _pallas_impl(
            x, kv if has_kv else None, key_mask if has_mask else None,
            pos if has_pos else None, alpha if has_alpha else None,
            *params, num_heads=num_heads, ln_mode=ln_mode,
            include_residual=include_residual,
            residual_from_raw=residual_from_raw, eps=eps,
            img_block=img_block, interpret=interpret, quant=quant)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        x, kv, key_mask, pos, alpha, *params = res

        def body(x_, kv_, pos_, alpha_, *ps):
            return xla_equivalent(
                x_, kv_ if has_kv else None,
                key_mask if has_mask else None, *ps,
                num_heads=num_heads, ln_mode=ln_mode,
                include_residual=include_residual, eps=eps,
                pos=pos_ if has_pos else None,
                alpha=alpha_ if has_alpha else None,
                residual_from_raw=residual_from_raw)

        _, vjp = jax.vjp(body, x, kv, pos, alpha, *params)
        gx, gkv, gpos, galpha, *gp = vjp(g)
        return (gx, gkv, jnp.zeros_like(key_mask), gpos, galpha, *gp)

    f.defvjp(fwd, bwd)
    return f


def fused_attention(
    x: jnp.ndarray,                    # (B, Nq, C), Nq % 8 == 0
    ln_scale: jnp.ndarray,             # (C,) f32 (pass zeros/ones if unused)
    ln_bias: jnp.ndarray,              # (C,) f32
    wq, bq, wk, bk, wv, bv, wo, bo,    # (C, C) / (C,) projection params
    kv: Optional[jnp.ndarray] = None,  # (B, Nk, C) cross input, Nk % 8 == 0
    key_mask: Optional[jnp.ndarray] = None,  # (B, Nk) additive f32 (0/-1e9)
    pos: Optional[jnp.ndarray] = None,       # (Nq, C) added before LN/qkv
    alpha: Optional[jnp.ndarray] = None,     # scalar branch scale
    *,
    num_heads: int,
    ln_mode: str = "pre",              # pre | post | none
    include_residual: bool = True,
    residual_from_raw: bool = False,   # residual from x (not x+pos)
    eps: float = 1e-6,
    img_block: Optional[int] = None,
    interpret: Optional[bool] = None,
    quant: bool = False,               # W8A8 int8 projection GEMMs in-kernel
) -> jnp.ndarray:
    """One fused attention block — differentiable (custom VJP, XLA remat).

    quant=True runs the four projection GEMMs as W8A8 int8 (per-row
    activations, per-channel weights quantized in VMEM, int32 MXU accum) —
    the serving mode for FLOP-bound shapes; backward still recomputes
    through the full-precision XLA body (training unaffected)."""
    assert ln_mode in ("pre", "post", "none")
    # pre-LN with a cross kv would normalize kv with the QUERY-side
    # ln_scale/ln_bias (silently wrong math for a caller expecting a
    # separate kv norm) — no current caller needs pre+kv, so reject it
    assert not (ln_mode == "pre" and kv is not None), (
        "fused_attention: ln_mode='pre' with a cross kv input would apply "
        "the query-side LN params to kv; normalize kv outside the kernel "
        "or use ln_mode='none'")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if img_block is None:
        # 16 images/program measured best for the BERT serving path
        # (bert_int8k 9.46 ms vs 9.96 at IB=8, back-to-back)
        img_block = int(os.environ.get("MMRP_ATTN_IB", "16"))
    has_kv = kv is not None
    has_mask = key_mask is not None
    has_pos = pos is not None
    has_alpha = alpha is not None
    fn = _make_fused(num_heads, ln_mode, bool(include_residual),
                     bool(residual_from_raw), float(eps),
                     int(img_block), bool(interpret), has_kv, has_mask,
                     has_pos, has_alpha, bool(quant))
    # placeholders keep the custom_vjp arity static across variants
    kv_arg = kv if has_kv else jnp.zeros((1,), x.dtype)
    mask_arg = key_mask if has_mask else jnp.zeros((1,), jnp.float32)
    pos_arg = pos if has_pos else jnp.zeros((1,), x.dtype)
    alpha_arg = alpha if has_alpha else jnp.zeros((1,), jnp.float32)
    return fn(x, kv_arg, mask_arg, pos_arg, alpha_arg, ln_scale, ln_bias,
              wq, bq, wk, bk, wv, bv, wo, bo)
