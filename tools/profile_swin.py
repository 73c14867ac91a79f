"""Stage-level Swin profiling: where do the 57ms go?

Times nested prefixes of Swin-T (patch-embed only, +stage1, +stage2, ...)
with chained-scan timing. python tools/profile_swin.py [batch]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chained_time(fn, params, carry0, iters=10):
    import jax

    jfn = jax.jit(
        lambda p, c: jax.lax.scan(lambda x, _: (fn(p, x), ()), c, None,
                                  length=iters)[0].sum()
    )
    _ = float(jfn(params, carry0))
    t0 = time.perf_counter()
    _ = float(jfn(params, carry0))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mmrp_tpu.models.swin import PatchEmbed, SwinConfig, SwinEncoder

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, 224, 224, 3), dtype=np.float32))
    results = {}

    # patch embed alone
    pe = PatchEmbed(96, 4, dtype=jnp.bfloat16)
    pep = pe.init(jax.random.PRNGKey(0), img[:1])

    def pe_fn(p, x):
        out = pe.apply(p, x)
        return x + out.mean().astype(x.dtype) * 1e-12

    results["patch_embed_ms"] = chained_time(pe_fn, pep, img) * 1e3

    # cumulative stages
    variants = {
        "s1": (2,),
        "s12": (2, 2),
        "s123": (2, 2, 6),
        "full": (2, 2, 6, 2),
    }
    heads = (3, 6, 12, 24)
    for name, depths in variants.items():
        import os
        cfg = SwinConfig(img_size=224, embed_dim=96, depths=depths,
                         num_heads=heads[: len(depths)], window_size=7,
                         use_pallas=os.environ.get("PROFILE_PALLAS", "1") == "1",
                         drop_path_rate=0.0)
        enc = SwinEncoder(cfg, dtype=jnp.bfloat16)
        p = enc.init(jax.random.PRNGKey(0), img[:1])

        def fn(pp, x, _enc=enc):
            out = _enc.apply(pp, x)
            return x + out["global"].mean().astype(x.dtype) * 1e-12

        results[f"{name}_ms"] = chained_time(fn, p, img) * 1e3

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
