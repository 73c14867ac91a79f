"""Bisect the flagship-train compile failures at b192/b256 (VERDICT r4 #8).

BENCH_TRAIN_FLAGSHIP.json records `tpu_compile_helper subprocess exit
code 1` (HTTP 500 through the tunnel) for the Swin-B train step at
b192/b256 — with the error text truncated before the actual compiler
message. This tool (a) re-runs one trial per process capturing the FULL
exception, and (b) shrinks the graph along one axis at a time (batch,
swin stage-3 depth, text layers, fusion layers, grad-vs-forward) to find
the smallest failing configuration.

COMPILE-ONLY: each trial calls jit(...).lower(args).compile() — nothing
executes, but the remote compile helper does the full XLA pipeline, so
each trial costs minutes through the tunnel. Run trials one at a time.

Usage:
    python tools/bisect_train_compile.py trial <batch> [key=value ...]
        keys: depth3 (default 18), text_layers (12), fusion_layers (5),
              grad (1), core (1), mu (1 = Adam first moment in bf16,
              matching the bench's b*_mu rows), remat (0)
    python tools/bisect_train_compile.py plan
        prints the suggested trial sequence.

Each trial appends {config, ok, seconds, error} to BISECT_COMPILE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PLAN = """suggested sequence (one process each, full error capture):
  1. trial 192                    # reproduce, full error text
  2. trial 192 grad=0             # forward-only: compiler or autodiff graph?
  3. trial 192 depth3=6           # stage-3 depth -> graph size axis
  4. trial 192 text_layers=2      # text tower axis
  5. trial 160                    # last known-good batch, same process recipe
  6. trial 192 core=0             # without the Pallas core kernel
"""


def run_trial(batch: int, kv: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from bench import setup_compile_cache
    from mmrp_tpu.config import Config
    from mmrp_tpu.models.multimodal import (
        MultiModalConfig,
        MultiModalRetrievalModel,
    )
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig
    from mmrp_tpu.train.joint import init_train_state, make_train_step

    setup_compile_cache()
    depth3 = int(kv.get("depth3", 18))
    text_layers = int(kv.get("text_layers", 12))
    fusion_layers = int(kv.get("fusion_layers", 5))
    grad = kv.get("grad", "1") == "1"
    core = kv.get("core", "1") == "1"
    remat = kv.get("remat", "0") == "1"
    mu = kv.get("mu", "1") == "1"
    text_len = int(kv.get("text_len", "64"))

    os.environ["MMRP_SWIN_CORE"] = "1" if core else "0"

    swin = SwinConfig.base(use_pallas=False, remat=remat)
    import dataclasses

    swin = dataclasses.replace(swin, depths=(2, 2, depth3, 2))
    text = TextConfig.clinicalbert()
    text = dataclasses.replace(text, num_layers=text_layers)
    mm_cfg = MultiModalConfig(
        swin=swin, text=text, joint_dim=1024,
        num_fusion_layers=fusion_layers, num_heads=8, num_classes=43,
        max_text_len=text_len,
    )
    model = MultiModalRetrievalModel(mm_cfg, dtype=jnp.bfloat16)
    cfg = Config(batch_size=batch, epochs=1, adam_mu_bf16=mu)

    rng = np.random.default_rng(0)
    batch_np = {
        "image": rng.random((batch, 224, 224, 3), dtype=np.float32),
        "input_ids": rng.integers(
            0, text.vocab_size, (batch, text_len)).astype(np.int32),
        "attention_mask": np.ones((batch, text_len), np.int32),
        "labels": (rng.random((batch, 43)) < 0.1).astype(np.float32),
        "valid": np.ones((batch,), np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), jb,
                             total_steps=100)

    t0 = time.time()
    if grad:
        step = make_train_step(model, cfg, donate=False)
        lowered = jax.jit(step).lower(state, jb)
    else:
        fwd = lambda p, b: model.apply(  # noqa: E731
            {"params": p}, b["image"], b["input_ids"], b["attention_mask"],
            deterministic=True)["logits"].sum()
        lowered = jax.jit(fwd).lower(state.params, jb)
    lowered.compile()
    return {"ok": True, "seconds": round(time.time() - t0, 1)}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] == "plan":
        print(PLAN)
        return
    assert sys.argv[1] == "trial", PLAN
    batch = int(sys.argv[2])
    kv = dict(a.split("=", 1) for a in sys.argv[3:])
    rec = {"batch": batch, **kv}
    try:
        rec.update(run_trial(batch, kv))
    except Exception as e:  # noqa: BLE001 — the error text IS the result
        rec.update({
            "ok": False,
            "error_type": type(e).__name__,
            "error": "".join(
                traceback.format_exception_only(type(e), e))[:4000],
        })
    path = Path(__file__).resolve().parent.parent / "BISECT_COMPILE.json"
    doc = {"trials": []}
    if path.exists():
        try:
            doc = json.loads(path.read_text())
        except json.JSONDecodeError:
            pass
    doc["trials"].append(rec)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, path)
    print(json.dumps({k: v for k, v in rec.items() if k != "error"}))
    if not rec.get("ok"):
        print(rec["error"][:2000], file=sys.stderr)


if __name__ == "__main__":
    main()
