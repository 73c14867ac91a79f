"""A/B component benchmarks on the TPU (chained-scan timing).

Times ONE variant per process (first compile through the tunnel is slow and
dispatch dedup breaks multi-model timing — see CLAUDE.md). Usage:

    python tools/ab_bench.py <variant> [batch]

Variants:
    bert            12-layer BERT-base-dims text encoder, L64 (fused bf16)
    bert_ffn        ... with use_fused_ffn=True (Pallas FFN kernel)
    bert_int8       ... every GEMM W8A8 on the XLA path
    bert_int8ffn    ... fused bf16 attention + W8A8 FFN
    bert_int8k      ... W8A8 INSIDE the fused attention kernel + W8A8 FFN
    fusion          the full 5-layer fusion stack at joint_dim 1024
    fusion_int8     ... with W8A8 GEMMs (the serving default)
    swin            Swin-T encoder (current default path)
    swin_xla        Swin-T with use_pallas=False
    swin_int8k      Swin-T with DYNAMIC W8A8 whole-block GEMMs (measured worse)
    swin_int8s      ... STATIC W8A8 (pre-quantized weights + static act scales)
    swin_int8sw     ... static weights, dynamic per-row act scales
    swin_stages_TTFF  per-stage pallas gating
    proj            projection layers + classifier head only

Env: AB_TRACE=1 dumps a per-op trace aggregation to stderr; MMRP_* kernel
knobs apply (MMRP_ATTN_IB, MMRP_SWBLK, MMRP_SWIB, MMRP_SWIN_WHOLE[_MINC]).

Prints one JSON line {variant, batch, ms, unit}: ms is per model forward at
the given batch. Chained lax.scan with scalar fetch, 20 iters.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chained_time(fn, params, carry0, iters=20):
    import jax

    jfn = jax.jit(
        lambda p, c: jax.lax.scan(lambda x, _: (fn(p, x), ()), c, None,
                                  length=iters)[0].sum()
    )
    _ = float(jfn(params, carry0))  # compile + warmup
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        _ = float(jfn(params, carry0))
        best = min(best, time.perf_counter() - t0)
    if os.environ.get("AB_TRACE"):
        trace_dir = os.environ.get("AB_TRACE_DIR", "/tmp/ab_trace")
        with jax.profiler.trace(trace_dir):
            _ = float(jfn(params, carry0))
        _dump_trace(trace_dir, iters)
    return best / iters


def _dump_trace(trace_dir, iters, top=40):
    """Aggregate the device trace by op-name prefix (see profile_trace.py)."""
    import collections
    import re

    import jax

    files = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    data = jax.profiler.ProfileData.from_file(str(files[-1]))
    devs = [p for p in data.planes
            if "TPU" in p.name or "/device:" in p.name] or \
           [p for p in data.planes if p.name == "/host:CPU"]
    per = collections.Counter()
    cnt = collections.Counter()
    for line in devs[0].lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = re.match(r"%([a-zA-Z][\w-]*?)[.\d]*\s", ev.name)
            op = m.group(1) if m else ev.name[:24]
            if op == "while":
                continue
            per[op] += ev.duration_ns
            cnt[op] += 1
    import sys as _sys

    for k, v in per.most_common(top):
        print(f"{v/1e6/iters:9.3f} ms x{cnt[k]:5d}  {k}", file=_sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    from bench import setup_compile_cache

    setup_compile_cache()

    variant = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    L = int(os.environ.get("AB_TEXT_LEN", "64"))
    rng = np.random.default_rng(0)
    dt = None

    if variant.startswith("bert"):
        from mmrp_tpu.models.text_encoder import TextConfig, TextEncoder

        cfg = TextConfig.clinicalbert(
            use_fused_ffn=("ffn" in variant),
            use_fused_attention=("noattn" not in variant),
            quant=("int8_kernel" if "int8k" in variant
                   else "int8_ffn" if "int8ffn" in variant
                   else "int8" if "int8" in variant else "none"),
        )
        model = TextEncoder(cfg, dtype=jnp.bfloat16)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)).astype(np.int32))
        mask = jnp.ones((B, L), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

        def fn(p, ids_c):
            out = model.apply(p, ids_c, mask)
            return ids_c + (out["cls"].mean() * 0).astype(ids_c.dtype)

        dt = chained_time(fn, params, ids)

    elif variant.startswith("fusion"):
        from mmrp_tpu.models.multimodal import MultiModalConfig
        from mmrp_tpu.models.fusion import CrossModalFusion
        from mmrp_tpu.models.multimodal import FusionLayer
        from mmrp_tpu.models.swin import SwinConfig
        from mmrp_tpu.models.text_encoder import TextConfig
        from flax import linen as nn

        D = 1024
        cfg = MultiModalConfig(
            swin=SwinConfig.tiny(), text=TextConfig.clinicalbert(),
            joint_dim=D, num_fusion_layers=5, num_heads=8, num_classes=43,
            max_text_len=L,
            quant="int8" if "int8" in variant else "none",
        )

        fused = "xla" not in variant

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, patches, glob, txt, mask):
                import jax.numpy as jnp2

                Np = 49
                img_mask = None
                if fused and patches.shape[1] == Np:
                    patches = jnp2.pad(patches, ((0, 0), (0, 7), (0, 0)))
                    img_mask = jnp2.broadcast_to(
                        (jnp2.arange(56) < Np).astype(jnp2.int32)[None],
                        (patches.shape[0], 56))
                joint = glob
                for i in range(5):
                    pooled, _ = FusionLayer(cfg, drop_path=0.0,
                                            dtype=jnp.bfloat16,
                                            num_patches_real=Np,
                                            name=f"fusion_layer{i}")(
                        patches, glob, txt, mask,
                        need_attn=not fused, img_mask=img_mask)
                    joint = nn.LayerNorm(dtype=jnp.bfloat16,
                                         name=f"joint_norm{i}")(joint + pooled)
                return joint

        model = Stack()
        patches = jnp.asarray(rng.random((B, 49, D), np.float32), jnp.bfloat16)
        glob = jnp.asarray(rng.random((B, D), np.float32), jnp.bfloat16)
        txt = jnp.asarray(rng.random((B, L, D), np.float32), jnp.bfloat16)
        mask = jnp.ones((B, L), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), patches[:1], glob[:1],
                            txt[:1], mask[:1])
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

        def fn(p, patches_c):
            out = model.apply(p, patches_c, glob, txt, mask)
            return patches_c + (out.mean() * 1e-12).astype(patches_c.dtype)

        dt = chained_time(fn, params, patches)

    elif variant.startswith("swin"):
        from mmrp_tpu.models.swin import SwinConfig, SwinEncoder

        # swin | swin_xla | swin_stages_TTFF | swin_int8k (DYNAMIC W8A8
        # whole-block GEMMs at wide-C stages — measured loss) |
        # swin_int8s (STATIC W8A8: pre-quantized weights + calibrated
        # per-tensor act scales as constants; AB_ACT_AMAX sets the
        # synthetic scale, irrelevant to speed) | swin_int8sw (static
        # weights, dynamic per-row act scales); AB_SWIN=tiny|small|base
        # selects the encoder size (base = the Swin-B parity backbone)
        use_pallas = variant != "swin_xla"
        stages = None
        if "stages_" in variant:
            stages = tuple(c == "T" for c in variant.split("stages_")[1])
        size = os.environ.get("AB_SWIN", "tiny")
        depths = (2, 2, 18, 2) if size in ("small", "base") else (2, 2, 6, 2)
        if "int8s" in variant:
            a = float(os.environ.get("AB_ACT_AMAX", "8.0"))
            quant_kw = {"quant": "int8_static"}
            if "int8sw" not in variant:
                quant_kw["act_amax"] = tuple(
                    (a,) * 4 for _ in range(sum(depths)))
        elif "int8" in variant:
            quant_kw = {"quant": "int8"}
        else:
            quant_kw = {}
        model = SwinEncoder(
            SwinConfig.from_name(f"swin_{size}",
                                 use_pallas=use_pallas, pallas_stages=stages,
                                 **quant_kw),
            dtype=jnp.bfloat16)
        img = jnp.asarray(rng.random((B, 224, 224, 3), dtype=np.float32))
        params = model.init(jax.random.PRNGKey(0), img[:1])
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

        def fn(p, x):
            out = model.apply(p, x)
            return x + out["global"].mean().astype(x.dtype) * 1e-12

        dt = chained_time(fn, params, img)

    else:
        raise SystemExit(f"unknown variant {variant!r}")

    print(json.dumps({"variant": variant, "batch": B, "ms": dt * 1e3,
                      "per_item_us": dt / B * 1e6}))


if __name__ == "__main__":
    main()
