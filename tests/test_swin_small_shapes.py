"""Odd-resolution + remat regressions for the Swin encoder.

Production 224px stage maps (56/28/14/7) are all window-7-aligned; small
test configs (e.g. tiny@56px: 14/7/4/2) hit two paths the reference's timm
backbone handles but our encoder originally did not:

- PatchMerging at an odd map (7x7) must pad to even like timm
  (reference backbone: src/Model/fusion.py:92 swin_base via timm).
- A stage map smaller than the window must clamp the window to the map
  (timm: window_size = input_resolution when input_resolution <= window).
- nn.remat(SwinBlock) must mark `deterministic` static (a Python bool
  steering dropout branches — tracing it breaks `if deterministic`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.models.swin import PatchMerging, SwinConfig, SwinEncoder


def test_patch_merging_pads_odd():
    pm = PatchMerging(dim=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 7, 7, 4)),
                    jnp.float32)
    params = pm.init(jax.random.PRNGKey(0), x)
    out = pm.apply(params, x)
    assert out.shape == (1, 4, 4, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_four_stage_odd_resolutions_forward():
    # 56px tiny-like: stage maps 14 -> 7 -> 4 -> 2; windows clamp 7,7,4,2
    cfg = SwinConfig(img_size=56, embed_dim=8, depths=(1, 1, 1, 1),
                     num_heads=(1, 1, 2, 2), use_pallas=False)
    enc = SwinEncoder(cfg)
    x = jnp.zeros((2, 56, 56, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out["patches"].shape == (2, 4, cfg.num_features)
    assert out["global"].shape == (2, cfg.num_features)


def test_unaligned_resolution_rejected():
    # 48px patch4 -> 12, window 7: 12 % 7 != 0 and 12 > 7 — must raise,
    # not mis-reshape
    cfg = SwinConfig(img_size=48, embed_dim=8, depths=(1,), num_heads=(1,),
                     use_pallas=False)
    enc = SwinEncoder(cfg)
    with pytest.raises(ValueError, match="window"):
        enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))


def test_remat_grads_match_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)

    def loss_and_grad(remat):
        cfg = SwinConfig.micro(remat=remat, use_pallas=False,
                               drop_path_rate=0.0)
        enc = SwinEncoder(cfg)
        params = enc.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return enc.apply(p, x, False)["global"].sum()

        return jax.value_and_grad(loss)(params)

    l0, g0 = loss_and_grad(False)
    l1, g1 = loss_and_grad(True)
    assert np.allclose(l0, l1, rtol=1e-5)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
