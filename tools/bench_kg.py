"""KG-embedding training/eval throughput (the reference's GPU hot loop,
src/KnowledgeGraph/KG_Trainer.py:433-649 + 959-1219).

Synthetic graph at OpenI-hybrid scale (reports + images + labels + DOID/
RadLex ontology nodes land at tens of thousands of entities, a few
hundred thousand triples). Measures:

- TRAIN: the jitted self-adversarial step (pos + neg_size corruptions,
  softmax weights, adam) as a chained ``lax.scan`` — step i+1 consumes
  step i's params, so the tunnel's dispatch dedup cannot inflate the
  number (bench.py docstring).
- EVAL: filtered-ranking MRR/Hits (score each triple against ALL
  entities, head+tail) — one dispatch, timed to a scalar fetch.

Env: BENCH_KG_MODEL (TransE|TransH|RotatE|CompGCN), BENCH_KG_E,
BENCH_KG_T, BENCH_KG_DIM, BENCH_KG_BATCH, BENCH_KG_ITERS, BENCH_KG_NEG.
One model per process (CLAUDE.md). Writes/merges BENCH_KG.json; bench.py
folds it into BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "BENCH_KG.json"


def main() -> None:
    from bench import setup_compile_cache

    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from mmrp_tpu.kg.trainer import KGTrainer, KGTrainerConfig

    on_tpu = jax.default_backend() == "tpu"
    model = os.environ.get("BENCH_KG_MODEL", "TransE")
    E = int(os.environ.get("BENCH_KG_E", "50000" if on_tpu else "500"))
    R = 12
    T = int(os.environ.get("BENCH_KG_T", "200000" if on_tpu else "2000"))
    dim = int(os.environ.get("BENCH_KG_DIM", "300" if on_tpu else "32"))
    batch = int(os.environ.get("BENCH_KG_BATCH", "1024" if on_tpu else "64"))
    iters = int(os.environ.get("BENCH_KG_ITERS", "50" if on_tpu else "3"))
    neg = int(os.environ.get("BENCH_KG_NEG", "32"))

    rng = np.random.default_rng(0)
    triples = np.stack(
        [
            rng.integers(0, E, T),
            rng.integers(0, R, T),
            rng.integers(0, E, T),
        ],
        axis=1,
    ).astype(np.int32)
    conf = np.ones(T, np.float32)

    cfg = KGTrainerConfig(
        model=model, emb_dim=dim, batch_size=batch, neg_size=neg,
        use_bf16=on_tpu,
        **(dict(num_layers=2, opn="corr") if model == "CompGCN" else {}),
    )
    kgt = KGTrainer(E, R, cfg)
    kgt.load_triples(triples.tolist(), conf.tolist(), ["extracted"] * T)

    tx, train_step = kgt._make_train_step()
    opt_state = tx.init(kgt.params)
    b_idx = np.arange(batch) % kgt.train_arr.shape[0]
    bt = jnp.asarray(kgt.train_arr[b_idx])
    bc = jnp.asarray(kgt.train_conf[b_idx])
    key0 = jax.random.PRNGKey(0)

    # chained: params/opt carried through the scan; per-iter rng folded in
    def chain(params, opt_state):
        def body(carry, i):
            p, o = carry
            p, o, metrics = train_step(p, o, bt, bc,
                                       jax.random.fold_in(key0, i))
            return (p, o), metrics["loss"]

        (p, o), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(iters))
        return p, o, losses[-1]

    cfn = jax.jit(chain, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params2, opt2, loss = jax.block_until_ready(cfn(kgt.params, opt_state))
    loss = float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    params3, opt3, loss2 = cfn(params2, opt2)
    loss2 = float(loss2)  # scalar fetch forces the chain
    dt = time.perf_counter() - t0
    kgt.params = jax.tree_util.tree_map(lambda x: x, params3)

    row = {
        "model": model,
        "entities": E,
        "triples": T,
        "emb_dim": dim,
        "batch": batch,
        "neg_size": neg,
        "iters": iters,
        "step_ms": dt / iters * 1e3,
        "train_triples_per_sec": batch * iters / dt,
        "loss_first": loss,
        "loss_second": loss2,
        "compile_s": compile_s,
    }

    # filtered-ranking eval: one dispatch over the val split, scalar-forced
    n_val = kgt.val_arr.shape[0]
    _ = kgt.evaluate(kgt.val_arr[: min(64, n_val)])  # compile (smaller? same
    #   shapes matter: evaluate pads to eval_chunk internally, reuse shape)
    t0 = time.perf_counter()
    val = kgt.evaluate(kgt.val_arr[: min(64, n_val)])
    dt_eval = time.perf_counter() - t0
    n_ranked = min(64, n_val)
    row["eval_triples_per_sec"] = 2 * n_ranked / dt_eval  # head+tail
    row["eval_mrr_sanity"] = val["mrr"]

    existing = {}
    if OUT.exists():
        try:
            existing = json.loads(OUT.read_text())
        except ValueError:
            existing = {}
    existing[f"{model}_E{E//1000}k_d{dim}"] = {
        **row, "backend": jax.default_backend(),
        "method": "chained donated scan (train); single forced dispatch (eval)",
    }
    OUT.write_text(json.dumps(existing, indent=1))
    print(json.dumps(row))


if __name__ == "__main__":
    main()
