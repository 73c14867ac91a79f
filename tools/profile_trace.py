"""Per-op device profile of the embed path via jax.profiler (xprof).

Round-1 optimization was blind (BASELINE.md): the tunnel defeats naive
timing and ~13 ms of Swin stage-1 time stayed unattributed. This captures a
REAL trace: run the flagship embed chain under jax.profiler.trace, parse
the xplane with jax.profiler.ProfileData, and aggregate device-op wall time
by (HLO op category, name prefix).

Usage: python tools/profile_trace.py [out.json]
Env knobs: BENCH_BATCH, BENCH_TEXT_LEN, BENCH_PALLAS, BENCH_SWIN, PROF_ITERS.
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def capture(trace_dir: str):
    from bench import setup_compile_cache

    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "128" if on_tpu else "4"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    iters = int(os.environ.get("PROF_ITERS", "4"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    swin_name = os.environ.get("BENCH_SWIN", "tiny")

    # BENCH_QUANT mirrors bench.py's serving-precision selection so the trace
    # attributes the same program the flagship bench times.
    quant = os.environ.get("BENCH_QUANT", "none")
    cfg = MultiModalConfig(
        swin=(SwinConfig.base if swin_name == "base" else SwinConfig.tiny)(
            use_pallas=use_pallas
        ),
        text=TextConfig.clinicalbert(
            quant={"int8": "int8_kernel", "int8_all": "int8"}.get(quant, "none")),
        joint_dim=1024,
        num_fusion_layers=5,
        num_heads=8,
        num_classes=43,
        max_text_len=text_len,
        quant="int8" if quant.startswith("int8") else "none",
    )
    model = MultiModalRetrievalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, 224, 224, 3), dtype=np.float32))
    ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (batch, text_len)).astype(np.int32)
    )
    mask = jnp.ones((batch, text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img[:1], ids[:1], mask[:1])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    def chained(params, img0, ids, mask):
        def body(img_c, _):
            out = model.apply(params, img_c, ids, mask)
            img_next = img_c + out["joint_emb"].mean().astype(img_c.dtype) * 1e-12
            return img_next, ()

        final, _ = jax.lax.scan(body, img0, None, length=iters)
        return final.mean()

    fn = jax.jit(chained)
    _ = float(fn(params, img, ids, mask))  # compile + warm
    with jax.profiler.trace(trace_dir):
        v = float(fn(params, img, ids, mask))
    return {"batch": batch, "iters": iters, "text_len": text_len,
            "pallas": use_pallas, "swin": swin_name, "value": v}


def aggregate(trace_dir: str, iters: int):
    import jax

    files = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    assert files, f"no xplane under {trace_dir}"
    data = jax.profiler.ProfileData.from_file(str(files[-1]))
    plane_names = [p.name for p in data.planes]
    dev = None
    for p in data.planes:
        if "TPU" in p.name or "/device:" in p.name:
            dev = p
            break
    if dev is None:  # CPU backend: XLA ops live under the host plane
        for p in data.planes:
            if p.name == "/host:CPU":
                dev = p
                break
    if dev is None:
        raise RuntimeError(f"no device plane; planes = {plane_names}")

    per_op = collections.Counter()
    per_line = {}
    total = 0
    for line in dev.lines:
        lname = line.name
        lsum = 0
        for ev in line.events:
            dur = ev.duration_ns
            # Event names can be full HLO instruction strings
            # ("%stage2_block0.12 = bf16[...] custom-call(...)"); collapse
            # to the instruction-name prefix ("stage2_block"). The `while`
            # wrapper spans the whole chain — track it separately so the
            # per-op table decomposes the body instead of double-counting.
            m = re.match(r"%([a-zA-Z][\w\-]*?)[.\d]*[\s=]", ev.name)
            base = m.group(1) if m else re.sub(r"[.\d]+$", "", ev.name)
            # per-op table: sync XLA Ops line only (async copy/slice spans
            # overlap compute and double-count; Modules duplicate the body)
            if lname == "XLA Ops":
                if base == "while":
                    per_line["while(total)"] = (
                        per_line.get("while(total)", 0) + dur)
                else:
                    per_op[base] += dur
            lsum += dur
            total += dur
        per_line[lname] = per_line.get(lname, 0) + lsum
    return plane_names, per_op, per_line, total


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmrp_profile.json"
    trace_dir = os.environ.get("PROF_DIR", "/tmp/mmrp_trace")
    meta = capture(trace_dir)
    planes, per_op, per_line, total = aggregate(trace_dir, meta["iters"])
    it = meta["iters"]
    report = {
        "meta": meta,
        "planes": planes,
        "total_device_ms_per_iter": total / 1e6 / it,
        "lines_ms_per_iter": {
            k: v / 1e6 / it for k, v in sorted(
                per_line.items(), key=lambda kv: -kv[1])
        },
        "top_ops_ms_per_iter": {
            k: v / 1e6 / it for k, v in per_op.most_common(60)
        },
    }
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in ("meta", "planes",
                                             "total_device_ms_per_iter")}, indent=1))
    for k, v in list(report["top_ops_ms_per_iter"].items())[:40]:
        print(f"{v:9.3f} ms  {k}")


if __name__ == "__main__":
    main()
