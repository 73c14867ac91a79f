"""Micro-op profiling at Swin stage-1 shapes (B=128, 56x56x96).

Identifies which primitive dominates the 12ms/block cost.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chained(fn, *args, iters=20):
    import jax

    jfn = jax.jit(
        lambda c, *a: jax.lax.scan(
            lambda x, _: (fn(x, *a), ()), c, None, length=iters
        )[0].sum()
    )
    _ = float(jfn(*args))
    t0 = time.perf_counter()
    _ = float(jfn(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    B, H, W, C = 128, 56, 56, 96
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.random((C, 3 * C), dtype=np.float32), jnp.bfloat16)
    w_mlp1 = jnp.asarray(rng.random((C, 4 * C), dtype=np.float32), jnp.bfloat16)
    w_mlp2 = jnp.asarray(rng.random((4 * C, C), dtype=np.float32), jnp.bfloat16)
    res = {}

    res["noop_addeps"] = chained(lambda x: x + jnp.bfloat16(1e-6), x)
    res["layernorm"] = chained(
        lambda x: (x - x.mean(-1, keepdims=True))
        / jnp.sqrt(x.var(-1, keepdims=True) + 1e-5)
        + jnp.bfloat16(1e-6) * 0 + x * 0 + x,  # keep carry shape/dtype
        x,
    )
    res["qkv_gemm"] = chained(
        lambda x, w: x + (x.reshape(-1, C) @ w)[:, :C].reshape(x.shape) * 1e-6,
        x, w_qkv,
    )
    res["mlp"] = chained(
        lambda x, w1, w2: x + (
            jax.nn.gelu(x.reshape(-1, C) @ w1) @ w2
        ).reshape(x.shape) * jnp.bfloat16(1e-6),
        x, w_mlp1, w_mlp2,
    )
    res["roll"] = chained(lambda x: jnp.roll(x, (3, 3), (1, 2)), x)

    def partition_reverse(x):
        y = x.reshape(B, 8, 7, 8, 7, C).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, 64, 49, C)
        z = y.reshape(B, 8, 8, 7, 7, C).transpose(0, 1, 3, 2, 4, 5)
        return z.reshape(B, H, W, C)

    res["partition+reverse"] = chained(partition_reverse, x)

    # attention proper at window shapes (bf16 scores)
    q = jnp.asarray(rng.random((B, 64, 3, 49, 32), dtype=np.float32), jnp.bfloat16)

    def attn(q):
        s = jnp.einsum("bwhqd,bwhkd->bwhqk", q, q,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, -1).astype(q.dtype)
        return q + jnp.einsum("bwhqk,bwhkd->bwhqd", p, q) * jnp.bfloat16(1e-6)

    res["window_attn_f32scores"] = chained(attn, q)

    print({k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    main()
