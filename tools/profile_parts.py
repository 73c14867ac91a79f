"""Component-level throughput profiling on the TPU (chained-scan timing).

Times Swin-T, the text encoder, and the fusion stack separately to locate
the embed-path bottleneck. Usage: python tools/profile_parts.py [batch]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chained_time(fn, params, carry0, iters=20):
    """fn(params, carry) -> carry. Params passed as args (closures would be
    baked into the program as constants and blow the remote-compile body
    limit)."""
    import jax

    jfn = jax.jit(
        lambda p, c: jax.lax.scan(lambda x, _: (fn(p, x), ()), c, None,
                                  length=iters)[0].sum()
    )
    _ = float(jfn(params, carry0))  # compile + warmup
    t0 = time.perf_counter()
    _ = float(jfn(params, carry0))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from mmrp_tpu.models.swin import SwinConfig, SwinEncoder
    from mmrp_tpu.models.text_encoder import TextConfig, TextEncoder
    from mmrp_tpu.models.fusion import CrossModalFusion

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = 64
    rng = np.random.default_rng(0)
    results = {}

    # ---- Swin-T ----
    use_pallas = os.environ.get("PROFILE_PALLAS", "1") == "1"
    swin = SwinEncoder(SwinConfig.tiny(use_pallas=use_pallas), dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((B, 224, 224, 3), dtype=np.float32))
    sp = swin.init(jax.random.PRNGKey(0), img[:1])

    def swin_fn(p, x):
        out = swin.apply(p, x)
        return x + out["global"].mean().astype(x.dtype) * 1e-12

    dt = chained_time(swin_fn, sp, img)
    results["swin_t_ms"] = dt * 1e3
    results["swin_t_tflops"] = 4.5e9 * B / dt / 1e12

    # ---- text encoder (BERT-base dims) ----
    text = TextEncoder(TextConfig.clinicalbert(), dtype=jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, 28996, (B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    tp = text.init(jax.random.PRNGKey(0), ids[:1], mask[:1])

    def text_fn(p, ids_c):
        out = text.apply(p, ids_c, mask)
        bump = (out["cls"].mean() * 0).astype(ids_c.dtype)
        return ids_c + bump

    dt = chained_time(text_fn, tp, ids)
    results["bert_ms"] = dt * 1e3
    results["bert_tflops"] = 9.5e9 * B / dt / 1e12

    # ---- fusion stack (5 layers approximated by 5x one fusion call) ----
    D = 1024
    fusion = CrossModalFusion(dim=D, num_heads=8, num_patches=49,
                              max_text_len=L, dtype=jnp.bfloat16)
    patches = jnp.asarray(rng.random((B, 49, D), dtype=np.float32), jnp.bfloat16)
    glob = jnp.asarray(rng.random((B, D), dtype=np.float32), jnp.bfloat16)
    txt = jnp.asarray(rng.random((B, L, D), dtype=np.float32), jnp.bfloat16)
    fp = fusion.init(jax.random.PRNGKey(0), patches[:1], glob[:1], txt[:1],
                     mask[:1])

    def fusion_fn(fparams, p):
        seq, _ = fusion.apply(fparams, p, glob, txt, mask)
        for _ in range(4):
            seq2, _ = fusion.apply(fparams, p, glob, txt, mask)
            seq = seq + seq2
        return p + seq.mean().astype(p.dtype) * 1e-12

    dt = chained_time(fusion_fn, fp, patches, iters=10)
    results["fusion5_ms"] = dt * 1e3

    total_ms = results["swin_t_ms"] + results["bert_ms"] + results["fusion5_ms"]
    results["sum_ms"] = total_ms
    results["implied_pairs_per_sec"] = B / (total_ms / 1e3)
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
