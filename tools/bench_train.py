"""Train-step throughput sweep: pairs/sec/chip through the FULL training
step (forward + all losses + backward + optimizer), chained.

Chaining is inherent here — step i+1 consumes step i's updated TrainState —
so the tunnel's dispatch deduplication cannot inflate the number (see
bench.py docstring for why naive timing over-reports).

Runs a SWEEP of variants in one process (one tunnel-compile budget per
variant, but only one process — CLAUDE.md: batch TPU decisions so each
costs one process). Variant spec string, comma-separated:

    b{batch}[_mu][_remat]     e.g.  b64,b64_mu,b128_mu,b256_mu_remat

    _mu    = Adam first moment in bf16 (train/state.py::make_optimizer)
    _remat = jax.checkpoint per Swin block (SwinConfig.remat)

The chain is jitted with donate_argnums=0: the carried TrainState
(params + Adam m/v, ~GBs at ClinicalBERT scale) would otherwise be held
twice (input + output), which is what OOM'd the profiler at batch<=32.

Writes all rows (and per-variant errors) to BENCH_TRAIN.json; bench.py
merges it into BENCH_DETAILS.json. Env knobs: BENCH_VARIANTS,
BENCH_TEXT_LEN, BENCH_PALLAS, BENCH_SWIN (tiny|base), BENCH_ITERS,
AB_TRACE=<variant-name> (per-op trace after that variant's timing),
AB_TRACE_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / os.environ.get(
    "BENCH_TRAIN_OUT", "BENCH_TRAIN.json"
)  # flagship (BENCH_SWIN=base) sweeps write BENCH_TRAIN_FLAGSHIP.json so
#    the Swin-T and Swin-B row tables don't mix


def parse_variant(spec: str):
    parts = spec.strip().split("_")
    assert parts[0].startswith("b"), f"bad variant {spec!r}"
    return {
        "name": spec.strip(),
        "batch": int(parts[0][1:]),
        "mu_bf16": "mu" in parts[1:],
        "remat": "remat" in parts[1:],
        # _xla: plain-XLA attention in training. The Pallas kernels' custom
        # VJPs recompute the XLA forward for the backward (fwd_pallas +
        # ~3x fwd_xla total) vs plain autodiff storing intermediates
        # (~3x fwd_xla + activation HBM) — which wins is an empirical
        # question per batch size.
        "xla": "xla" in parts[1:],
        # _core: MMRP_SWIN_CORE raw-layout window-attention kernel with the
        # hand-written backward (ops/wattn_core.py) inside the XLA branch —
        # targets the 18% relayout-copy share (docs/ROOFLINE.md §8).
        "core": "core" in parts[1:],
        # _pad: MMRP_SWIN_CORE_PAD — lift the (3*dim)%128 Mosaic lane gate
        # via the kernel's in-VMEM _pad_lanes path, so Swin-T's unaligned
        # stages 1-2 (3C = 288/576) also route through the core kernel.
        "pad": "pad" in parts[1:],
    }


def run_variant(v, *, swin_name, text_len, iters, use_pallas, on_tpu, trace):
    import jax
    import jax.numpy as jnp

    from mmrp_tpu.config import Config
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig
    from mmrp_tpu.train.joint import compute_losses, init_train_state

    os.environ["MMRP_SWIN_CORE"] = "1" if v.get("core") else "0"
    os.environ["MMRP_SWIN_CORE_PAD"] = "1" if v.get("pad") else "0"
    batch = v["batch"]
    img = 224 if on_tpu else 56
    swin = (SwinConfig.base if swin_name == "base" else SwinConfig.tiny)(
        use_pallas=use_pallas and not v["xla"], img_size=img,
        remat=v["remat"],
    )
    # _remat remats all three heavy towers (Swin blocks, BERT layers,
    # fusion stack)
    text_cfg = (TextConfig.clinicalbert(remat=v["remat"]) if on_tpu
                else TextConfig.small(remat=v["remat"]))
    mm_cfg = MultiModalConfig(
        swin=swin,
        text=text_cfg,
        joint_dim=1024 if on_tpu else 64,
        num_fusion_layers=5 if on_tpu else 1,
        num_heads=8 if on_tpu else 2,
        num_classes=43,
        max_text_len=text_len,
        remat_fusion=v["remat"],
    )
    model = MultiModalRetrievalModel(
        mm_cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32
    )
    cfg = Config(batch_size=batch, epochs=1, adam_mu_bf16=v["mu_bf16"])

    rng = np.random.default_rng(0)
    kg_dim = 300
    batch_np = {
        "image": rng.random((batch, img, img, 3), dtype=np.float32),
        "input_ids": rng.integers(
            0, mm_cfg.text.vocab_size, (batch, text_len)
        ).astype(np.int32),
        "attention_mask": np.ones((batch, text_len), np.int32),
        "labels": (rng.random((batch, 43)) < 0.1).astype(np.float32),
        "valid": np.ones((batch,), np.float32),
        "kg_target": rng.standard_normal((batch, kg_dim)).astype(np.float32),
        "kg_target_valid": np.ones((batch,), np.float32),
    }
    batch_dev = {k: jnp.asarray(v_) for k, v_ in batch_np.items()}
    state = init_train_state(
        model, cfg, jax.random.PRNGKey(0), batch_dev, total_steps=1000,
        kg_dim=kg_dim,
    )
    params_m = sum(x.size for x in jax.tree.leaves(state.params)) / 1e6
    pw = jnp.ones((43,), jnp.float32)

    def one_step(st, _):
        step_rng = st.step_rng()

        def loss_fn(params):
            return compute_losses(model, params, batch_dev, step_rng, cfg, pw)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(grads=grads), metrics["loss/total"]

    def chain_fn(st):
        st, losses = jax.lax.scan(one_step, st, None, length=iters)
        return st, losses[-1]

    # donate the carried state: params + Adam m/v held once, not twice
    chain = jax.jit(chain_fn, donate_argnums=0)

    t0 = time.perf_counter()
    state2, loss = jax.block_until_ready(chain(state))  # donates `state`
    loss = float(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state3, loss2 = chain(state2)  # donates `state2`
    loss2 = float(loss2)  # scalar fetch forces the whole chain
    dt = time.perf_counter() - t0

    row = {
        "batch": batch,
        "mu_bf16": v["mu_bf16"],
        "remat": v["remat"],
        "xla_attention": v["xla"],
        "core_kernel": v.get("core", False),
        "core_pad": v.get("pad", False),
        "iters": iters,
        "step_ms": dt / iters * 1e3,
        "train_pairs_per_sec": batch * iters / dt,
        "loss_first": loss,
        "loss_second": loss2,
        "compile_s": compile_s,
        "params_m": round(params_m, 1),
    }

    if trace:
        # per-op attribution (same aggregation as tools/ab_bench.py) — AFTER
        # the timing so the record survives a profiler OOM.
        from ab_bench import _dump_trace  # tools/ on sys.path as a script

        trace_dir = os.environ.get("AB_TRACE_DIR", "/tmp/train_trace")
        with jax.profiler.trace(trace_dir):
            _, l3 = chain(state3)
            float(l3)
        _dump_trace(trace_dir, iters, top=40)
    return row


def main() -> None:
    import jax

    from bench import setup_compile_cache

    setup_compile_cache()

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "10" if on_tpu else "2"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    swin_name = os.environ.get("BENCH_SWIN", "tiny")
    default_variants = (
        "b64,b64_mu,b128_mu,b256_mu_remat" if on_tpu else "b2,b2_mu_remat"
    )
    specs = os.environ.get("BENCH_VARIANTS", default_variants)
    trace_variant = os.environ.get("AB_TRACE", "")

    result = {
        "metric": f"train_pairs_per_sec_per_chip(swin_{swin_name},L{text_len},"
        f"{'pallas' if use_pallas else 'xla'})",
        "backend": backend,
        "method": "chained donated TrainState scan, scalar fetch",
        "rows": {},
    }
    if OUT.exists():  # merge with earlier sweeps' rows (same backend only)
        try:
            prev = json.loads(OUT.read_text())
            if prev.get("backend") == backend:
                result["rows"].update(prev.get("rows", {}))
        except (OSError, ValueError):
            pass
    # best_* must compare only rows measured in THIS process: absolute
    # times drift across sessions (CLAUDE.md chip-state drift — the same
    # graph measured 17.5 vs 27.5 ms hours apart), so a stale fast row
    # from a merged earlier sweep must never win over a fresh one
    fresh = set()
    result["best_note"] = "best_* over this session's rows only (drift)"
    for spec in specs.split(","):
        v = parse_variant(spec)
        try:
            row = run_variant(
                v,
                swin_name=swin_name,
                text_len=text_len,
                iters=iters,
                use_pallas=use_pallas,
                on_tpu=on_tpu,
                trace=(v["name"] == trace_variant),
            )
        except Exception as e:  # noqa: BLE001 — record OOMs, keep sweeping
            row = {"error": repr(e)[:300]}
        result["rows"][v["name"]] = row
        fresh.add(v["name"])
        best_name, best = max(
            ((n, r) for n, r in result["rows"].items()
             if n in fresh and "train_pairs_per_sec" in r),
            key=lambda nr: nr[1]["train_pairs_per_sec"],
            default=(None, None),
        )
        if best:
            result["best_train_pairs_per_sec"] = best["train_pairs_per_sec"]
            result["best_step_ms"] = best["step_ms"]
            result["best_batch"] = best["batch"]
            result["best_variant"] = best_name
        OUT.write_text(json.dumps(result, indent=1))  # survive later OOMs
        print(json.dumps({v["name"]: row}), flush=True)

    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
