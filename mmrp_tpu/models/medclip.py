"""MedCLIP vision encoder: Swin-Tiny backbone + 512-d projection head.

The reference's ``medclip`` image backbone loads the MedCLIP-ViT checkpoint
and auto-probes its output dim (reference: src/Model/fusion.py:131-171).
MedCLIP's "ViT" vision tower is in fact an HF SwinModel
(microsoft/swin-tiny-patch4-window7-224) followed by a bias-free
``projection_head`` Linear(768 -> 512) — so the TPU-native equivalent
reuses our SwinEncoder (fused Pallas kernels included) and projects both
patch tokens and the pooled global vector to the 512-d CLIP space. Weight
porting: models/port.py::convert_medclip_vit + tests/test_port.py.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from mmrp_tpu.models.swin import SwinConfig, SwinEncoder


class MedCLIPVisionEncoder(nn.Module):
    """Output contract matches the other vision encoders:
    dict(patches (B, Np, 512), global (B, 512))."""

    swin: SwinConfig
    proj_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def medclip_tiny(cls, img_size: int = 224, use_pallas: bool = True,
                     dtype=jnp.float32) -> "MedCLIPVisionEncoder":
        return cls(
            swin=SwinConfig.tiny(img_size=img_size, use_pallas=use_pallas),
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        feats = SwinEncoder(self.swin, dtype=self.dtype, name="swin")(
            x, deterministic
        )
        proj = nn.Dense(
            self.proj_dim, use_bias=False, dtype=self.dtype, name="projection"
        )
        # project patch tokens and the pooled vector through the same head
        # (pool-then-project == project-then-pool for a linear map; the
        # reference probes the projected dim and consumes it downstream)
        return {
            "patches": proj(feats["patches"]),
            "global": proj(feats["global"]),
        }
