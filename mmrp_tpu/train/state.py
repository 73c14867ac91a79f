"""Train state + optimizer factory.

Replaces the reference's ad-hoc loop state (model, AdamW, cosine-warmup
scheduler, GradScaler — src/Trainner/train.py:517-523) with a single
functional TrainState. No GradScaler: TPU bf16 compute keeps f32 params and
f32 loss, so no loss scaling is needed (SURVEY §2.9 mixed-precision note).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Adds the RNG folding + constant aux params the joint trainer needs."""

    base_rng: jax.Array = struct.field(pytree_node=True, default=None)

    def step_rng(self) -> jax.Array:
        return jax.random.fold_in(self.base_rng, self.step)


def make_optimizer(
    lr: float,
    total_steps: int,
    warmup_frac: float = 0.1,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
    mu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW + cosine schedule with linear warmup + global-norm clip 1.0
    (reference train.py:517-523, grad clip train.py:598-601).

    mu_dtype=bfloat16 halves the first-moment HBM traffic: the optimizer
    update is memory-bound on this chip (~7 bytes moved per param per step
    at f32 m/v), and Adam's m tolerates bf16 (v stays f32 — its dynamic
    range matters for the rsqrt).
    """
    warmup = max(1, int(total_steps * warmup_frac))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=lr * 0.01,
    )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay, mu_dtype=mu_dtype),
    )
