import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.models.finetune_head import SwinForFinetune
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.train.swin_finetune import (
    SwinFinetuneConfig,
    calibrate_temperature,
    finetune,
    freeze_mask_for_epoch,
    lr_range_test,
    make_finetune_optimizer,
    pos_weight_ramp,
    smooth_labels,
)

MICRO_SWIN = SwinConfig(img_size=28, embed_dim=16, depths=(1,), num_heads=(2,),
                        window_size=7, use_pallas=False)


def test_smooth_labels():
    y = jnp.asarray([[0.0, 1.0]])
    out = np.asarray(smooth_labels(y, 0.1))
    np.testing.assert_allclose(out, [[0.05, 0.95]])


def test_pos_weight_ramp():
    base = np.array([10.0, 1.0])
    e0 = pos_weight_ramp(base, epoch=0, ramp_epochs=5, clamp=5.0)
    e4 = pos_weight_ramp(base, epoch=4, ramp_epochs=5, clamp=5.0)
    assert e0[0] < e4[0] <= 5.0
    np.testing.assert_allclose(e4, [5.0, 1.0])


def test_lr_range_test_picks_reasonable():
    # synthetic loss curve: improves until lr=0.01, diverges after 0.1
    def loss_at(lr):
        if lr > 0.1:
            return 100.0
        return 1.0 + (np.log10(lr) + 2) ** 2  # min at 1e-2

    lr = lr_range_test(loss_at, 1e-6, 1.0, steps=25)
    assert 1e-4 <= lr <= 1e-1


def test_calibrate_temperature_recovers_scale(rng):
    # logits intentionally over-confident by factor 3 -> T should approach 3
    true_logits = rng.standard_normal((500, 4)).astype(np.float32)
    labels = (jax.nn.sigmoid(jnp.asarray(true_logits)) > rng.random((500, 4))).astype(np.float32)
    overconfident = true_logits * 3.0
    T = calibrate_temperature(overconfident, np.asarray(labels), steps=300)
    assert 2.0 < T < 4.5


def test_freeze_mask_progressive(rng):
    model = SwinForFinetune(swin=MICRO_SWIN, num_classes=4, num_heads=2)
    img = jnp.asarray(rng.random((1, 28, 28, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    cfg = SwinFinetuneConfig(unfreeze_epochs=(1, 5, 10))
    m0 = freeze_mask_for_epoch(cfg, params, epoch=0)
    flat0 = jax.tree_util.tree_leaves(m0)
    # at epoch 0 nothing of the backbone is unfrozen, head params all 1.0
    head_mask = [float(x) for x in jax.tree_util.tree_leaves(
        {k: v for k, v in m0.items() if k != "swin"})]
    assert all(x == 1.0 for x in head_mask)
    bb_mask0 = [float(x) for x in jax.tree_util.tree_leaves(m0["swin"])]
    assert all(x == 0.0 for x in bb_mask0)
    m10 = freeze_mask_for_epoch(cfg, params, epoch=10)
    bb_mask10 = [float(x) for x in jax.tree_util.tree_leaves(m10["swin"])]
    assert all(x == 1.0 for x in bb_mask10)
    m1 = freeze_mask_for_epoch(cfg, params, epoch=1)
    bb_mask1 = [float(x) for x in jax.tree_util.tree_leaves(m1["swin"])]
    assert any(x == 1.0 for x in bb_mask1)  # deepest stage released first


def _loaders(rng, n=16, B=8, C=6):
    imgs = rng.random((n, 28, 28, 3)).astype(np.float32)
    labels = (rng.random((n, C)) < 0.4).astype(np.float32)

    def batches():
        for s in range(0, n, B):
            yield {
                "image": imgs[s : s + B],
                "labels": labels[s : s + B],
                "valid": np.ones(min(B, n - s), np.float32),
            }

    return batches, labels


def test_finetune_loop_runs_and_overfits(rng):
    """Single-batch overfit smoke test (the reference's debug mode,
    finetune_swin.py:570-660)."""
    model = SwinForFinetune(swin=MICRO_SWIN, num_classes=6, num_heads=2)
    batches, labels = _loaders(rng)
    cfg = SwinFinetuneConfig(lr=3e-3, epochs=4, patience=10,
                             unfreeze_epochs=(0, 1, 2), label_smoothing=0.0)
    result = finetune(
        model, cfg, batches, batches,
        base_pos_weight=np.ones(6, np.float32),
        sample_image=np.zeros((1, 28, 28, 3), np.float32),
    )
    assert result["thresholds"].shape == (6,)
    assert result["temperature"] > 0
    assert "macro_f1" in result["report"] or result["report"]["per_class"]
    assert np.isfinite(result["report"]["micro_f1"])
