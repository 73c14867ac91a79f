"""Train-step throughput bench: pairs/sec/chip through the FULL training
step (forward + all losses + backward + optimizer), chained.

Chaining is inherent here — step i+1 consumes step i's updated TrainState —
so the tunnel's dispatch deduplication cannot inflate the number (see
bench.py docstring for why naive timing over-reports).

Writes BENCH_TRAIN.json; bench.py merges it into BENCH_DETAILS.json.
Env knobs: BENCH_BATCH, BENCH_TEXT_LEN, BENCH_PALLAS, BENCH_SWIN
(tiny|base), BENCH_ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import setup_compile_cache

    setup_compile_cache()

    from mmrp_tpu.config import Config
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig
    from mmrp_tpu.train.joint import compute_losses, init_train_state

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "64" if on_tpu else "2"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "10" if on_tpu else "2"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    swin_name = os.environ.get("BENCH_SWIN", "tiny")
    img = 224 if on_tpu else 56

    swin = (SwinConfig.base if swin_name == "base" else SwinConfig.tiny)(
        use_pallas=use_pallas,
        img_size=img,
    )
    mm_cfg = MultiModalConfig(
        swin=swin,
        text=TextConfig.clinicalbert() if on_tpu else TextConfig.small(),
        joint_dim=1024 if on_tpu else 64,
        num_fusion_layers=5 if on_tpu else 1,
        num_heads=8 if on_tpu else 2,
        num_classes=43,
        max_text_len=text_len,
    )
    model = MultiModalRetrievalModel(mm_cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    cfg = Config(batch_size=batch, epochs=1)

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
    batch_dev = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_train_state(
        model, cfg, jax.random.PRNGKey(0), batch_dev, total_steps=1000,
        kg_dim=kg_dim,
    )
    pw = jnp.ones((43,), jnp.float32)

    def one_step(st, _):
        step_rng = st.step_rng()

        def loss_fn(params):
            return compute_losses(model, params, batch_dev, step_rng, cfg, pw)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(grads=grads), metrics["loss/total"]

    @jax.jit
    def chain(st):
        st, losses = jax.lax.scan(one_step, st, None, length=iters)
        return st, losses[-1]

    t0 = time.perf_counter()
    state2, loss = jax.block_until_ready(chain(state))
    loss = float(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, loss2 = chain(state2)
    loss2 = float(loss2)  # scalar fetch forces the whole chain
    dt = time.perf_counter() - t0

    if os.environ.get("AB_TRACE"):
        # per-op attribution of the train step (same aggregation as
        # tools/ab_bench.py) — VERDICT r2 #4: trace the step like the embed
        # path was traced
        from ab_bench import _dump_trace  # tools/ is on sys.path when run as a script

        trace_dir = os.environ.get("AB_TRACE_DIR", "/tmp/train_trace")
        with jax.profiler.trace(trace_dir):
            _, l3 = chain(state2)
            float(l3)
        _dump_trace(trace_dir, iters, top=40)

    result = {
        "metric": f"train_pairs_per_sec_per_chip(swin_{swin_name},L{text_len},"
        f"{'pallas' if use_pallas else 'xla'})",
        "backend": backend,
        "batch": batch,
        "iters": iters,
        "step_ms": dt / iters * 1e3,
        "train_pairs_per_sec": batch * iters / dt,
        "loss_first": loss,
        "loss_second": loss2,
        "compile_s": compile_s,
        "method": "chained TrainState scan, scalar fetch",
    }
    out = Path(__file__).resolve().parent.parent / "BENCH_TRAIN.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
