"""W8A8 dynamic quantization for the FLOP-bound GEMMs (serving path).

Measured reality (docs/ROOFLINE.md + round-2 traces): the BERT text encoder
and the 5-layer fusion stack run at ~130-155 TFLOP/s effective — FLOP-bound
at the chip's sustained bf16 rate. The only remaining lever for them is
cheaper MACs: the v5e MXU runs int8 at 2x the bf16 rate. This module
implements the standard dynamic W8A8 scheme:

- weights: symmetric per-output-channel int8 (`quantize_weight`), computed
  from the bf16/f32 checkpoint at trace time — XLA's loop-invariant code
  motion hoists it out of scan/embed/eval loops, so steady-state cost is
  zero there. Single-dispatch serving (MMRPredictor.predict with params as
  jit arguments) re-quantizes per call: one VPU pass over the weight bytes,
  ~1-2 ms for the full model — negligible against per-request latency but
  worth knowing when profiling;
- activations: symmetric per-row (per-token) int8, computed on the fly;
- GEMM: int8 x int8 -> int32 on the MXU, dequantized by the rank-1 outer
  product of the two scale vectors.

`quant_einsum` is a drop-in for `x @ w + b` on (..., K) x (K, N). Accuracy
is validated in tests/test_quant.py (per-layer error, end-to-end embedding
cosine, retrieval-order stability) — the same guarantees the reference's
fp16 autocast serving provides (reference src/Trainner/train.py AMP usage).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, eps: float = 1e-8
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) float -> (int8 (K, N), f32 per-out-channel scale (1, N))."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    s = jnp.maximum(amax, eps) / 127.0
    wq = jnp.round(wf / s).astype(jnp.int8)
    return wq, s


def quantize_acts(x: jnp.ndarray, eps: float = 1e-8
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., K) float -> (int8, f32 per-row scale (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, eps) / 127.0
    xq = jnp.round(xf / s).astype(jnp.int8)
    return xq, s


def quant_dot_multi(x: jnp.ndarray, wbs, out_dtype: Optional[jnp.dtype] = None):
    """Apply several (w, b) GEMMs to ONE activation tensor, quantizing the
    activations once (e.g. the q/k/v projections off a shared input)."""
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_acts(x)
    nb = x.ndim - 1
    outs = []
    for w, b in wbs:
        wq, sw = quantize_weight(w)
        acc = jax.lax.dot_general(
            xq, wq,
            dimension_numbers=(((nb,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o = acc.astype(jnp.float32) * sx * sw.reshape((1,) * nb + (w.shape[1],))
        if b is not None:
            o = o + b.astype(jnp.float32)
        outs.append(o.astype(out_dtype))
    return outs


def quant_dot(x: jnp.ndarray, w: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              out_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """x (..., K) @ w (K, N) [+ bias] via dynamic W8A8 int8 MXU GEMM.

    Weight quantization is trace-time constant folding / LICM-hoisted; the
    per-token activation quantization runs on the fly (VPU).
    """
    out_dtype = out_dtype or x.dtype
    wq, sw = quantize_weight(w)
    xq, sx = quantize_acts(x)
    nb = x.ndim - 1
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((nb,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw.reshape(
        (1,) * nb + (w.shape[1],))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
