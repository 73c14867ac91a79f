"""Swin Transformer vision encoder (Flax linen, Pallas window attention).

From-scratch Swin for TPU — the reference consumes timm's
``swin_base_patch4_window7_224`` through ``forward_features`` and mean-pools
patches for the global vector (reference: src/Model/fusion.py:189-265).
This implementation keeps the same architecture family (patch-embed 4x4,
4 stages, window 7, shifted windows, relative position bias, patch merging)
but runs on the framework's own attention ops: on TPU each block's first
half (LN + qkv + window attention + proj [+ residual]) is ONE fused Pallas
kernel (ops/fused_window_attention.py) and the MLP half fuses at
bandwidth-bound widths (ops/fused_mlp.py) — both differentiable via custom
VJPs (XLA-recompute backward), so TRAINING takes the fused path too; CPU
uses the un-padded XLA formulation (ops/window_attention.py). Static
per-layer bias tensors fold relative-position bias + shifted-window masks.
Patch embedding is a space-to-depth GEMM with conv-compatible parameters.
See docs/KERNELS.md for the measured rationale.

Presets: ``tiny`` (96, [2,2,6,2]) and ``base`` (128, [2,2,18,2]) — final
feature dim 768 / 1024, 49 patches at 224x224, matching the shapes the rest
of the stack expects (fusion.py:259-265).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import contextlib
import os

from mmrp_tpu.models.layers import DenseParams, DropPath, LnParams, Mlp, ln_f32
from mmrp_tpu.ops.window_attention import (
    build_rel_bias,
    shift_attn_mask,
    window_attention_xla_direct,
    window_partition,
    window_reverse,
)


def _pallas_backend() -> bool:
    """Fused kernels run on TPU; MMRP_FORCE_PALLAS=1 runs them in interpret
    mode elsewhere (tests exercise the exact production code path on CPU)."""
    return (
        jax.default_backend() == "tpu"
        or os.environ.get("MMRP_FORCE_PALLAS") == "1"
    )


# Trace-time override for the window-attention CORE kernel gate (see
# WindowAttention below). The env/device-count default exists because the
# Pallas custom call cannot auto-partition under plain GSPMD on a >1-chip
# mesh; a shard_map-wrapped caller (train/joint.py::make_train_step_dp)
# hands the kernel PER-SHARD shapes, where it is safe and fast, and opts
# in through this context instead of mutating process env at trace time.
_CORE_FORCE: Optional[bool] = None


@contextlib.contextmanager
def force_core(enabled: Optional[bool]):
    """Within the context, force the CORE window-attention kernel ON/OFF
    regardless of MMRP_SWIN_CORE and device count (None = defer to the
    default gate). Trace-time only — wrap the ``model.apply`` call."""
    global _CORE_FORCE
    prev = _CORE_FORCE
    _CORE_FORCE = enabled
    try:
        yield
    finally:
        _CORE_FORCE = prev


@dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dropout: float = 0.0
    use_pallas: bool = True
    # per-stage override of use_pallas (None = use_pallas everywhere): lets
    # late stages (tiny nW, wide C) take the XLA path where measured faster
    pallas_stages: Optional[Tuple[bool, ...]] = None
    # "int8": dynamic W8A8 GEMMs inside the whole-block kernel at wide-C
    # stages (serving path only; ops/quant.py scheme — measured +9.5% LOSS
    # from the per-grid-program weight re-quant, docs/ROOFLINE.md §6);
    # "int8_static": pre-quantized int8 weights + calibrated per-tensor
    # activation scales (act_amax below) — the static scheme that removes
    # exactly that overhead
    quant: str = "none"
    # quant="int8_static": per-block calibrated activation abs-max, a tuple
    # (global block order) of 4-tuples (qkv_in, proj_in, mlp1_in, mlp2_in)
    # from models/quant_calib.py::calibrate_swin_act_amax. None = dynamic
    # per-row activation scales (weights still pre-quantized static).
    act_amax: Optional[Tuple[Tuple[float, float, float, float], ...]] = None
    remat: bool = False  # jax.checkpoint per block: FLOPs for activation memory

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @staticmethod
    def tiny(**kw) -> "SwinConfig":
        return SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), **kw)

    @staticmethod
    def small(**kw) -> "SwinConfig":
        return SwinConfig(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), **kw)

    @staticmethod
    def base(**kw) -> "SwinConfig":
        return SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), **kw)

    @staticmethod
    def micro(**kw) -> "SwinConfig":
        """Smoke-test scale: one 7x7-window stage."""
        kw.setdefault("img_size", 28)
        return SwinConfig(embed_dim=16, depths=(1,), num_heads=(2,), **kw)

    @staticmethod
    def from_name(name: str, **kw) -> "SwinConfig":
        name = name.lower()
        if name in ("swin", "swin_base", "base"):
            return SwinConfig.base(**kw)
        if name in ("swin_small", "small"):
            return SwinConfig.small(**kw)
        if name in ("swin_tiny", "tiny"):
            return SwinConfig.tiny(**kw)
        if name in ("swin_micro", "micro"):
            return SwinConfig.micro(**kw)
        raise ValueError(f"unknown swin preset {name!r}")


class PatchEmbed(nn.Module):
    """Patch embedding as space-to-depth + matmul.

    Mathematically identical to the stride-ps conv (non-overlapping patches)
    but avoids TPU's inefficient tiny-input-channel convolution: the pixels
    are regrouped to (B, H/ps, W/ps, ps*ps*C) and hit the MXU as one GEMM.
    The parameter keeps nn.Conv's (ps, ps, C, D) kernel layout so ported
    checkpoints (models/port.py) load unchanged.
    """

    embed_dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        ps = self.patch_size
        k, b = ConvParams(self.embed_dim, ps, C, name="proj")()
        x = x.reshape(B, H // ps, ps, W // ps, ps, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // ps, W // ps, ps * ps * C)
        w = k.reshape(ps * ps * C, self.embed_dim)  # (kh, kw, in) flatten order
        x = x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return x  # (B, H/ps, W/ps, embed_dim)


class ConvParams(nn.Module):
    """(kh, kw, in, out) kernel + bias with nn.Conv's tree layout."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class MlpParams(nn.Module):
    """Dense_0/Dense_1 kernels+biases with the Mlp module's tree layout."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self):
        d0 = DenseParams(self.hidden, name="Dense_0")(self.out)
        d1 = DenseParams(self.out, name="Dense_1")(self.hidden)
        return d0, d1


class WinAttnParams(nn.Module):
    """WindowAttention's parameters (same tree: rel_bias_table/qkv/proj)
    without the computation — consumed by the whole-block fused kernel."""

    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        rel_table = self.param(
            "rel_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        qkv = DenseParams(self.dim * 3, name="qkv")(self.dim)
        proj = DenseParams(self.dim, name="proj")(self.dim)
        return rel_table, qkv, proj


class WindowAttention(nn.Module):
    """Windowed multi-head self-attention with relative position bias."""

    dim: int
    num_heads: int
    window_size: int
    shift: int
    input_resolution: Tuple[int, int]
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln_scale, ln_bias, deterministic: bool = True):
        """x: RAW (pre-LN) (B, H, W, C). Returns (out, residual_included):
        the fused Pallas path computes x + proj(attn(LN(x))) in one kernel
        (residual_included=True); the autodiff-able XLA path returns only
        the branch proj(attn(LN(x))) so the caller can apply DropPath."""
        H, W = self.input_resolution
        ws = self.window_size
        shift = self.shift if min(H, W) > ws else 0
        B = x.shape[0]
        N = ws * ws
        nW = (H // ws) * (W // ws)
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        rel_table = self.param(
            "rel_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        qkv_k, qkv_b = DenseParams(self.dim * 3, name="qkv")(self.dim)
        proj_k, proj_b = DenseParams(self.dim, name="proj")(self.dim)

        # Fused Pallas path (differentiable via custom VJP). At inference
        # the kernel also fuses the residual add; in training it returns the
        # raw branch so the caller can apply DropPath.
        # MMRP_SWIN_ATTN_CORE=1 skips it so the XLA branch's raw-layout
        # CORE kernel serves this stage instead (serving A/B knob: at
        # Swin-B widths only stage 1 (C=128) takes this path).
        if (self.use_pallas and _pallas_backend()
                and os.environ.get("MMRP_SWIN_ATTN_CORE", "0") != "1"):
            from mmrp_tpu.ops.fused_window_attention import (
                build_bias_full,
                fused_window_attention_windows,
            )

            include_residual = deterministic
            if shift > 0:
                x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            bias_full = build_bias_full(rel_table, ws, H, W, shift)
            xw = window_partition(x, ws)  # (B, nW, N, C) raw
            ow = fused_window_attention_windows(
                xw,
                ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
                qkv_k.astype(self.dtype), qkv_b.astype(self.dtype),
                proj_k.astype(self.dtype), proj_b.astype(self.dtype),
                bias_full, self.num_heads,
                include_residual=include_residual,
            )
            out = window_reverse(ow, ws, H, W)
            if shift > 0:
                out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
            return out, include_residual

        # XLA path: manual LN (params shared with the fused path)
        y = ln_f32(x, ln_scale, ln_bias, self.dtype)
        # static-quant calibration statistic (models/quant_calib.py): the
        # qkv GEMM input's abs-max. sow() is a no-op (and the max is DCE'd)
        # unless apply() runs with mutable=["intermediates"].
        self.sow("intermediates", "qkv_in_amax",
                 jnp.max(jnp.abs(y)).astype(jnp.float32),
                 reduce_fn=jnp.maximum,
                 init_fn=lambda: jnp.array(0.0, jnp.float32))

        # Default ON for the TPU XLA branch (i.e. training, where
        # use_pallas is off): measured back-to-back on the Swin-B b64
        # train step 201.1 vs 242.4 ms/step (+20.5% pairs/s, loss equal
        # to 4 decimals; copies 44.8 -> ~12 ms in the per-op trace) —
        # BENCH_TRAIN_FLAGSHIP.json, docs/ROOFLINE.md §8. CPU keeps the
        # XLA formulation (interpret-mode kernels are test-only).
        # Default ON only single-chip: the Pallas custom call does not
        # auto-partition under plain GSPMD jit on a >1-device mesh
        # (wattn_core.py multi-chip note). A shard_map-wrapped train
        # step sees per-shard shapes and can opt in with
        # MMRP_SWIN_CORE=1 explicitly.
        core_default = ("1" if jax.default_backend() == "tpu"
                        and jax.device_count() == 1 else "0")
        # Mosaic's shape-cast inference requires the kernel's window-split
        # reshape to keep a 128-multiple lane dim: (B, H, W, 3C) ->
        # (bb, H/ws, ws, W/ws, ws, 3C) fails with "unsupported shape cast"
        # when 3C % 128 != 0 (measured: Swin-T stages 1-2, 3C = 288/576;
        # Swin-B is aligned at every stage). The kernel's in-VMEM lane
        # padding (ops/wattn_core._pad_lanes) lifts that and is the
        # DEFAULT: measured back-to-back on the Swin-T b128 train step
        # 249.1 vs 285.6 ms (+14.6% pairs/s, 513.9 vs 448.3, losses
        # equal — BENCH_TRAIN.json b128_mu_xla_core_pad). Set
        # MMRP_SWIN_CORE_PAD=0 to route unaligned stages back to XLA.
        core_aligned = (3 * self.dim) % 128 == 0 \
            or jax.default_backend() != "tpu" \
            or os.environ.get("MMRP_SWIN_CORE_PAD", "1") == "1"
        want_core = (
            _CORE_FORCE
            if _CORE_FORCE is not None
            else os.environ.get("MMRP_SWIN_CORE", core_default) == "1"
        )
        if (
            want_core
            and core_aligned
            and H % ws == 0 and W % ws == 0 and nW > 1
        ):
            # Raw-layout attention CORE with a hand-written backward
            # kernel (ops/wattn_core.py): the qkv/proj GEMMs stay in XLA
            # (they run AT the measured FLOP roof, docs/ROOFLINE.md §8),
            # while roll + window partition/reverse + softmax live in one
            # VMEM residency in BOTH directions — eliminating the 18%
            # layout-copy share of the flagship train step. At nW == 1
            # (stage 4) the partition is a free reshape, so the XLA path
            # below stays.
            from mmrp_tpu.ops.fused_window_attention import build_bias_full
            from mmrp_tpu.ops.wattn_core import window_attention_core

            bias = build_bias_full(rel_table, ws, H, W, shift)
            qkv = y @ qkv_k.astype(y.dtype) + qkv_b.astype(y.dtype)
            attn_out = window_attention_core(
                qkv, bias, ws=ws, shift=shift,
                num_heads=self.num_heads, scale=scale,
            )
            out = attn_out @ proj_k.astype(y.dtype) + proj_b.astype(y.dtype)
            return out, False

        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
        rel = build_rel_bias(rel_table, ws)
        smask = (
            jnp.asarray(shift_attn_mask(H, W, ws, shift)) if shift > 0 else None
        )
        if (os.environ.get("MMRP_SWIN_XLA_6D", "0") == "1"
                and H % ws == 0 and W % ws == 0):
            # 6D no-copy formulation: measured 2.9x SLOWER on the Swin-B
            # train step (every materialized tensor gets trailing ws=7
            # dims -> 128-lane padding waste); kept for documentation,
            # docs/ROOFLINE.md §8 addendum.
            from mmrp_tpu.ops.window_attention import window_attention_xla_6d

            qkv = y @ qkv_k.astype(y.dtype) + qkv_b.astype(y.dtype)
            qkv6 = qkv.reshape(B, H // ws, ws, W // ws, ws, 3,
                               self.num_heads, head_dim)
            attn_out = window_attention_xla_6d(
                qkv6, rel, smask, scale, ws).reshape(B, H, W, self.dim)
            out = attn_out @ proj_k.astype(y.dtype) + proj_b.astype(y.dtype)
        else:
            # partition BEFORE the qkv GEMM: the window transpose then
            # moves the C-wide map instead of the 3C-wide qkv tensor
            # (halves the attention segment's relayout bytes, fwd AND
            # bwd — the copies are 18% of the Swin-B train step,
            # docs/ROOFLINE.md §8). The GEMM runs identically on the
            # windowed layout (XLA flattens the (B, nW, N) free dims
            # into one large-M matmul either way). Math is bit-identical
            # (per-token GEMM commutes with the token permutation);
            # gated off until the train-step A/B.
            if os.environ.get("MMRP_SWIN_XLA_PREQKV", "0") == "1":
                yw = window_partition(y, ws)  # (B, nW, N, C)
                win = yw @ qkv_k.astype(y.dtype) + qkv_b.astype(y.dtype)
            else:
                qkv = y @ qkv_k.astype(y.dtype) + qkv_b.astype(y.dtype)
                win = window_partition(qkv, ws)  # (B, nW, N, 3C)
            winq = win.reshape(B, nW, N, 3, self.num_heads, head_dim)
            attn_out = window_attention_xla_direct(winq, rel, smask, scale)
            attn_out = window_reverse(attn_out, ws, H, W)  # (B, H, W, C)
            self.sow("intermediates", "proj_in_amax",
                     jnp.max(jnp.abs(attn_out)).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.array(0.0, jnp.float32))
            out = attn_out @ proj_k.astype(y.dtype) + proj_b.astype(y.dtype)
        if shift > 0:
            out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
        return out, False


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    input_resolution: Tuple[int, int]
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dropout: float = 0.0
    use_pallas: bool = True
    quant: str = "none"
    # calibrated (qkv_in, proj_in, mlp1_in, mlp2_in) activation abs-max for
    # quant="int8_static" (None = dynamic per-row activation scales)
    act_amax: Optional[Tuple[float, float, float, float]] = None
    dtype: jnp.dtype = jnp.float32

    def _static_qweights(self, qkv_k, proj_k, w1, w2):
        """int8 weights + per-out-channel scales for quant="int8_static".

        Reads the ``quant_cache`` collection when the caller provides one
        (built ONCE outside jit by models/quant_calib.build_quant_cache —
        dispatch-per-batch serving then pays zero re-quantization); falls
        back to inline quantization, which XLA hoists out of chained-scan
        bench loops but re-runs per dispatch (~2.6 ms at Swin-B widths).
        """
        if self.has_variable("quant_cache", "wq_qkv"):
            g = lambda n: self.get_variable("quant_cache", n)  # noqa: E731
            return ((g("wq_qkv"), g("s_qkv")), (g("wq_proj"), g("s_proj")),
                    (g("wq_mlp1"), g("s_mlp1")), (g("wq_mlp2"), g("s_mlp2")))
        from mmrp_tpu.ops.quant import quantize_weight

        return (quantize_weight(qkv_k), quantize_weight(proj_k),
                quantize_weight(w1), quantize_weight(w2))

    @nn.compact
    def __call__(self, x, deterministic: bool = True, collect: bool = False):
        ln0_s, ln0_b = LnParams(name="LayerNorm_0")(self.dim)

        # Whole-block fused path (serving/eval): LN0+qkv+attn+proj+residual
        # +LN1+MLP+residual in ONE VMEM residency — the feature map makes a
        # single HBM round trip per block instead of four. Parameter trees
        # are identical to the unfused path (WinAttnParams mirrors
        # WindowAttention; LnParams/MlpParams are shared declarations).
        H_, W_ = self.input_resolution
        ws = self.window_size

        if collect:
            # Stage-pair mode (ops/fused_swin_pair.py): declare the SAME
            # param tree as the fused/unfused paths and hand the raw
            # kernel inputs back to SwinEncoder, which runs this block and
            # its shifted partner in ONE pallas program. No compute here.
            from mmrp_tpu.ops.fused_swin_block import build_bias_padded

            rel_table, (qkv_k, qkv_b), (proj_k, proj_b) = WinAttnParams(
                self.dim, self.num_heads, ws, name="attn")()
            ln1_s, ln1_b = LnParams(name="LayerNorm_1")(self.dim)
            hidden = int(self.dim * self.mlp_ratio)
            (w1, b1), (w2, b2) = MlpParams(hidden, self.dim, name="mlp")()
            shift = self.shift if min(H_, W_) > ws else 0
            out = {
                "bias_pad": build_bias_padded(rel_table, ws, H_, W_, shift),
                "shift": shift,
                "wscales": None,
                "act_scales": None,
            }
            if self.quant == "int8_static":
                ((wq_qkv, s_qkv), (wq_proj, s_proj),
                 (wq_1, s_1), (wq_2, s_2)) = self._static_qweights(
                    qkv_k, proj_k, w1, w2)
                out["blk"] = (
                    ln0_s.astype(jnp.float32), ln0_b.astype(jnp.float32),
                    wq_qkv, qkv_b.astype(self.dtype),
                    wq_proj, proj_b.astype(self.dtype),
                    ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32),
                    wq_1, b1.astype(self.dtype),
                    wq_2, b2.astype(self.dtype),
                )
                out["wscales"] = (s_qkv.reshape(-1), s_proj.reshape(-1),
                                  s_1.reshape(-1), s_2.reshape(-1))
                if self.act_amax is not None:
                    out["act_scales"] = tuple(
                        float(a) / 127.0 for a in self.act_amax)
            else:
                out["blk"] = (
                    ln0_s.astype(jnp.float32), ln0_b.astype(jnp.float32),
                    qkv_k.astype(self.dtype), qkv_b.astype(self.dtype),
                    proj_k.astype(self.dtype), proj_b.astype(self.dtype),
                    ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32),
                    w1.astype(self.dtype), b1.astype(self.dtype),
                    w2.astype(self.dtype), b2.astype(self.dtype),
                )
            return out
        # Whole-block kernel only at wide C — back-to-back A/B on the chip
        # (tools/ab_bench.py swin): all-stage pad flavor 27.9 ms, per-window
        # +MLP flavor at stages 1/2 31.4 ms, OLD path 27.5-27.7 ms, and
        # whole-block at C>=256 with the old path at stages 1/2 = 26.5 ms
        # (best). At C<=192 the attention-only kernel + separate large-M
        # fused MLP wins; at C>=384 the single large-M padded GEMMs and the
        # VMEM-resident MLP pay off.
        if (
            self.use_pallas
            and deterministic
            and _pallas_backend()
            and os.environ.get("MMRP_SWIN_WHOLE", "1") == "1"
            and self.dim >= int(os.environ.get("MMRP_SWIN_WHOLE_MINC", "256"))
            and H_ % ws == 0 and W_ % ws == 0
        ):
            from mmrp_tpu.ops.fused_swin_block import (
                build_bias_padded,
                fused_swin_block_windows,
            )

            rel_table, (qkv_k, qkv_b), (proj_k, proj_b) = WinAttnParams(
                self.dim, self.num_heads, ws, name="attn")()
            ln1_s, ln1_b = LnParams(name="LayerNorm_1")(self.dim)
            hidden = int(self.dim * self.mlp_ratio)
            (w1, b1), (w2, b2) = MlpParams(hidden, self.dim, name="mlp")()

            shift = self.shift if min(H_, W_) > ws else 0
            xs = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2)) if shift \
                else x
            bias_pad = build_bias_padded(rel_table, ws, H_, W_, shift)
            blk_args = (
                ln0_s.astype(jnp.float32), ln0_b.astype(jnp.float32),
                qkv_k.astype(self.dtype), qkv_b.astype(self.dtype),
                proj_k.astype(self.dtype), proj_b.astype(self.dtype),
                ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
            )
            if self.quant == "int8_static":
                # static W8A8: weights quantized OUTSIDE the kernel (one
                # VPU pass per forward, LICM-hoisted out of scan loops;
                # constant-folded entirely when params are trace constants)
                # + calibrated per-tensor activation scales as compile-time
                # floats — removes the dynamic scheme's per-grid-program
                # weight re-quant and abs-max passes (docs/ROOFLINE.md §6).
                # Windows flavor only (MMRP_SWIN_RAW does not apply).
                ((wq_qkv, s_qkv), (wq_proj, s_proj),
                 (wq_1, s_1), (wq_2, s_2)) = self._static_qweights(
                    qkv_k, proj_k, w1, w2)
                act_scales = (
                    tuple(float(a) / 127.0 for a in self.act_amax)
                    if self.act_amax is not None else None)
                xw = window_partition(xs, ws)
                ow = fused_swin_block_windows(
                    xw,
                    ln0_s.astype(jnp.float32), ln0_b.astype(jnp.float32),
                    wq_qkv, qkv_b.astype(self.dtype),
                    wq_proj, proj_b.astype(self.dtype),
                    ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32),
                    wq_1, b1.astype(self.dtype),
                    wq_2, b2.astype(self.dtype),
                    bias_pad, self.num_heads,
                    quant="static",
                    wscales=(s_qkv.reshape(-1), s_proj.reshape(-1),
                             s_1.reshape(-1), s_2.reshape(-1)),
                    act_scales=act_scales,
                )
                out = window_reverse(ow, ws, H_, W_)
            elif os.environ.get("MMRP_SWIN_RAW", "0") == "1":
                # raw-map flavor: BlockSpecs slice windows straight out of
                # the feature map — no XLA partition/reverse copies
                from mmrp_tpu.ops.fused_swin_block import fused_swin_block_raw

                out = fused_swin_block_raw(
                    xs, *blk_args, bias_pad, self.num_heads, ws,
                    quant=(self.quant == "int8"),
                )
            else:
                xw = window_partition(xs, ws)
                ow = fused_swin_block_windows(
                    xw, *blk_args, bias_pad, self.num_heads,
                    quant=(self.quant == "int8"),
                )
                out = window_reverse(ow, ws, H_, W_)
            if shift:
                out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
            return out

        y, residual_included = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=self.window_size,
            shift=self.shift,
            input_resolution=self.input_resolution,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )(x, ln0_s, ln0_b, deterministic)
        if residual_included:  # fused kernel already added x (eval only)
            x = y
        else:
            x = x + DropPath(self.drop_path)(y, deterministic)

        # second half: LN -> MLP -> residual. Params are declared explicitly
        # (same tree as nn.LayerNorm/Mlp) so the fused Pallas kernel and the
        # autodiff-able unfused path share checkpoints.
        hidden = int(self.dim * self.mlp_ratio)
        ln = LnParams(name="LayerNorm_1")
        ln_scale, ln_bias = ln(self.dim)
        mlp_params = MlpParams(hidden, self.dim, name="mlp")
        (w1, b1), (w2, b2) = mlp_params()

        # fused LN+MLP+residual pays off only where the hidden stream is
        # HBM-bound (small C); at C>=384 XLA's pipelined GEMMs win (measured).
        # Differentiable (custom VJP); training requires dropout == 0 (the
        # kernel has no interior dropout) and applies DropPath to the branch.
        if (
            self.use_pallas
            and self.dim <= 256
            and (deterministic or self.dropout == 0.0)
            and _pallas_backend()
        ):
            from mmrp_tpu.ops.fused_mlp import fused_ln_mlp_residual

            B, H, W, C = x.shape
            include_residual = deterministic
            out = fused_ln_mlp_residual(
                x.reshape(B * H * W, C),
                ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                include_residual=include_residual,
            ).reshape(B, H, W, C)
            if include_residual:
                return out
            return x + DropPath(self.drop_path)(out, deterministic)

        y = ln_f32(x, ln_scale, ln_bias, self.dtype)
        self.sow("intermediates", "mlp1_in_amax",
                 jnp.max(jnp.abs(y)).astype(jnp.float32),
                 reduce_fn=jnp.maximum,
                 init_fn=lambda: jnp.array(0.0, jnp.float32))
        y = jax.nn.gelu(y @ w1.astype(self.dtype) + b1.astype(self.dtype))
        self.sow("intermediates", "mlp2_in_amax",
                 jnp.max(jnp.abs(y)).astype(jnp.float32),
                 reduce_fn=jnp.maximum,
                 init_fn=lambda: jnp.array(0.0, jnp.float32))
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = y @ w2.astype(self.dtype) + b2.astype(self.dtype)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic)


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 2C)
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            # odd resolutions (small test configs) pad like timm's Swin;
            # production 224px never merges at an odd size
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype)(x)


class SwinEncoder(nn.Module):
    """Returns dict(patches (B, 49, F), global (B, F)) like the reference's
    forward_features + mean-pool contract (fusion.py:255-265)."""

    config: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        res = cfg.img_size // cfg.patch_size
        x = PatchEmbed(cfg.embed_dim, cfg.patch_size, dtype=self.dtype, name="patch_embed")(x)

        total_blocks = sum(cfg.depths)
        if cfg.act_amax is not None and len(cfg.act_amax) != total_blocks:
            raise ValueError(
                f"act_amax has {len(cfg.act_amax)} entries, model has "
                f"{total_blocks} blocks — recalibrate "
                "(models/quant_calib.py) for this architecture")
        dpr = np.linspace(0.0, cfg.drop_path_rate, total_blocks)
        block_idx = 0
        dim = cfg.embed_dim
        # static_argnums counts the module instance as arg 0, so
        # `deterministic` (a Python bool steering dropout branches) is 2 —
        # without this, remat traces it and `if deterministic` fails.
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if cfg.remat else SwinBlock
        for stage, depth in enumerate(cfg.depths):
            stage_pallas = cfg.use_pallas if cfg.pallas_stages is None \
                else bool(cfg.pallas_stages[stage])
            # clamp the window to the stage resolution (timm does the same
            # when input_resolution <= window_size — small test configs);
            # production 224px resolutions are all multiples of 7
            ws = min(cfg.window_size, res)
            if res % ws:
                raise ValueError(
                    f"stage {stage}: resolution {res} not divisible by "
                    f"window {ws} — pick img_size/depths whose per-stage "
                    f"maps are window-aligned"
                )
            # Stage-pair routing (ops/fused_swin_pair.py): run each
            # W-MSA + SW-MSA pair in ONE pallas program where the pair's
            # VMEM footprint fits (Swin-B stage 2) — the map stays in VMEM
            # across both blocks, removing the inter-block HBM round trip
            # and the roll/partition/reverse copies (VERDICT r4 #6).
            from mmrp_tpu.ops.fused_swin_pair import (
                chain_vmem_ok,
                fused_swin_block_chain,
                fused_swin_block_pair,
                pair_vmem_ok,
            )

            use_pair = (
                os.environ.get("MMRP_SWIN_PAIR", "1") == "1"
                and stage_pallas
                and deterministic
                and _pallas_backend()
                and os.environ.get("MMRP_SWIN_WHOLE", "1") == "1"
                and cfg.quant != "int8"     # dynamic int8: measured loss
                and dim >= int(os.environ.get("MMRP_SWIN_WHOLE_MINC", "256"))
                # C=512 pairs fit VMEM under static-int8 weights but are a
                # MEASURED loss on-chip (Swin-B B=64 back-to-back: 25.74 ms
                # with C=256-only pairs vs 27.69 ms adding the C=512 stage,
                # +7.5% — the 784-row GEMM tiles at C=512 trade worse than
                # the saved inter-block HBM trips). Opt-in via env only.
                and dim <= int(os.environ.get("MMRP_SWIN_PAIR_MAXC", "256"))
                and res > ws and res % ws == 0
                and pair_vmem_ok(dim, res, res, cfg.num_heads[stage], ws,
                                 cfg.mlp_ratio,
                                 weight_bytes=(1 if cfg.quant ==
                                               "int8_static" else 2))
            )

            # Roll-chain routing (ops/fused_swin_pair.py::
            # fused_swin_block_chain): for whole-block-eligible stages the
            # pair kernel does NOT take (C=512/1024, or an odd tail
            # block), run each block as ONE raw-map program that applies
            # the next block's roll in-VMEM — consecutive blocks chain
            # custom-call -> custom-call with zero XLA relayout/roll ops
            # between (the ~3 ms/forward "copy" share in the round-4
            # serving trace, docs/ROOFLINE.md §6).
            # DEFAULT ON since the round-5 clean trio (Swin-B B=64
            # static-int8, back-to-back: pair-off 25.75 / pair256 25.34 /
            # pair256+chain 24.99 ms, docs/chain_trio_r5.jsonl) — the
            # chain is a -2.9% serve win over pair-off and -1.4% over
            # pair-only. MMRP_SWIN_CHAIN=0 restores the pair-only route.
            use_chain = (
                os.environ.get("MMRP_SWIN_CHAIN", "1") == "1"
                and stage_pallas
                and deterministic
                and _pallas_backend()
                and os.environ.get("MMRP_SWIN_WHOLE", "1") == "1"
                and cfg.quant != "int8"  # dynamic int8: measured loss
                and dim >= int(os.environ.get("MMRP_SWIN_WHOLE_MINC", "256"))
                and res % ws == 0
                and chain_vmem_ok(dim, res, res, cfg.num_heads[stage], ws,
                                  cfg.mlp_ratio,
                                  weight_bytes=(1 if cfg.quant ==
                                                "int8_static" else 2))
            )

            def _mk(blk, bidx=None, ddim=dim, sstage=stage, wws=ws, rres=res):
                # bidx: ABSOLUTE dpr/act_amax index. The pair branch calls
                # with block_idx parked at the (even) pair start, so
                # block_idx + (blk % 2) resolves the partner; the chain
                # branch advances block_idx per block and passes it
                # explicitly.
                i = block_idx + (blk % 2) if bidx is None else bidx
                return SwinBlock(
                    dim=ddim,
                    num_heads=cfg.num_heads[sstage],
                    window_size=wws,
                    shift=0 if blk % 2 == 0 else wws // 2,
                    input_resolution=(rres, rres),
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path=float(dpr[i]),
                    dropout=cfg.dropout,
                    use_pallas=stage_pallas,
                    quant=cfg.quant,
                    act_amax=(cfg.act_amax[i]
                              if cfg.act_amax is not None else None),
                    dtype=self.dtype,
                    name=f"stage{sstage}_block{blk}",
                )

            blk = 0
            while blk < depth:
                if use_pair and blk % 2 == 0 and blk + 1 < depth:
                    c0 = _mk(blk)(x, deterministic, True)
                    c1 = _mk(blk + 1)(x, deterministic, True)
                    x = fused_swin_block_pair(
                        x, c0["blk"], c0["bias_pad"],
                        c1["blk"], c1["bias_pad"],
                        cfg.num_heads[stage], ws, c1["shift"],
                        quant=("static" if cfg.quant == "int8_static"
                               else False),
                        wscales0=c0["wscales"], wscales1=c1["wscales"],
                        act_scales0=c0["act_scales"],
                        act_scales1=c1["act_scales"],
                    )
                    blk += 2
                    block_idx += 2
                    continue
                if use_chain:
                    c = _mk(blk, bidx=block_idx)(x, deterministic, True)
                    if blk + 1 < depth and res > ws:
                        next_shift = 0 if (blk + 1) % 2 == 0 else ws // 2
                    else:
                        next_shift = 0
                    x = fused_swin_block_chain(
                        x, c["blk"], c["bias_pad"],
                        cfg.num_heads[stage], ws,
                        c["shift"] - next_shift,
                        quant=("static" if cfg.quant == "int8_static"
                               else False),
                        wscales=c["wscales"],
                        act_scales=c["act_scales"],
                    )
                    blk += 1
                    block_idx += 1
                    continue
                x = block_cls(
                    dim=dim,
                    num_heads=cfg.num_heads[stage],
                    window_size=ws,
                    shift=0 if blk % 2 == 0 else ws // 2,
                    input_resolution=(res, res),
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path=float(dpr[block_idx]),
                    dropout=cfg.dropout,
                    use_pallas=stage_pallas,
                    quant=cfg.quant,
                    act_amax=(cfg.act_amax[block_idx]
                              if cfg.act_amax is not None else None),
                    dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x, deterministic)
                blk += 1
                block_idx += 1
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
                res = (res + 1) // 2  # PatchMerging pads odd sizes

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        B, H, W, C = x.shape
        patches = x.reshape(B, H * W, C)
        return {"patches": patches, "global": patches.mean(axis=1)}
