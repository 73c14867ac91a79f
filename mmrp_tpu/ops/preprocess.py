"""Fused on-device DICOM preprocessing + augmentation.

The reference preprocesses on the host per sample (pydicom -> numpy ->
PIL -> torchvision, reference: src/DataHandler/tensorDICOM.py:112-158).
Here the math after decode — window/level, normalize, resize, 3-channel
expansion, mean/std, rotation/flip augmentation — is ONE jitted XLA graph
over a whole batch, so it fuses with the encoder's first conv and rides the
TPU instead of the input hosts.

``preprocess_batch`` consumes raw decoded pixel batches (B, H, W) float32
(from the Python or native C++ decoder) and emits model-ready NHWC tensors.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def window_normalize(
    raw: jnp.ndarray,  # (B, H, W) float32 raw pixels
    window_center: jnp.ndarray,  # (B,)
    window_width: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    """Per-sample window/level clip -> [0,1] (reference
    tensorDICOM.py:52-70). The ONE copy of the windowing math, shared by
    ``preprocess_batch`` (training/offline) and the streaming serve
    ingest (serve/stream.py) so the two paths cannot drift."""
    lower = (window_center - window_width / 2.0)[:, None, None]
    upper = (window_center + window_width / 2.0)[:, None, None]
    x = jnp.clip(raw, lower, upper)
    return (x - lower) / jnp.maximum(upper - lower, 1e-8)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def preprocess_batch(
    raw: jnp.ndarray,  # (B, H, W) float32 raw pixels
    window_center: jnp.ndarray,  # (B,)
    window_width: jnp.ndarray,  # (B,)
    out_hw: Tuple[int, int] = (224, 224),
    mean: float = 0.5,
    std: float = 0.5,
) -> jnp.ndarray:
    """window -> [0,1] -> resize -> 3ch -> normalize. Returns (B, H', W', 3)."""
    x = window_normalize(raw, window_center, window_width)
    x = jax.image.resize(x, (x.shape[0],) + tuple(out_hw), method="bilinear")
    x = (x - mean) / std
    return jnp.repeat(x[..., None], 3, axis=-1)


@functools.partial(jax.jit, static_argnames=())
def augment_batch(
    images: jnp.ndarray,  # (B, H, W, C) normalized
    rng: jax.Array,
    max_rotate_deg: float = 5.0,
    hflip_prob: float = 0.1,
) -> jnp.ndarray:
    """Random rotation within ±max_rotate_deg + horizontal flip w/ prob —
    the reference's torchvision augmentations (tensorDICOM.py:41-45), done
    batched on device with a single gather per image."""
    B, H, W, C = images.shape
    k_rot, k_flip = jax.random.split(rng)
    theta = (
        jax.random.uniform(k_rot, (B,), minval=-1.0, maxval=1.0)
        * max_rotate_deg
        * jnp.pi
        / 180.0
    )
    flip = jax.random.bernoulli(k_flip, hflip_prob, (B,))

    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yc, xc = yy - cy, xx - cx

    def one(img, th, fl):
        cos, sin = jnp.cos(th), jnp.sin(th)
        src_y = cos * yc - sin * xc + cy
        src_x = sin * yc + cos * xc + cx
        src_x = jnp.where(fl, (W - 1) - src_x, src_x)
        y0 = jnp.clip(jnp.floor(src_y), 0, H - 1).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(src_x), 0, W - 1).astype(jnp.int32)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        wy = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]
        wx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
        a = img[y0, x0]
        b = img[y0, x1]
        c = img[y1, x0]
        d = img[y1, x1]
        return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx

    return jax.vmap(one)(images, theta, flip)
