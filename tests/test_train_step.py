import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.config import Config
from mmrp_tpu.train import losses as L


# ---------------- losses ----------------


def test_bce_matches_manual(rng):
    logits = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    y = jnp.asarray((rng.random((4, 3)) < 0.5), jnp.float32)
    got = float(L.bce_with_logits(logits, y))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    want = -(np.asarray(y) * np.log(p) + (1 - np.asarray(y)) * np.log(1 - p)).mean()
    assert abs(got - want) < 1e-5


def test_bce_pos_weight():
    logits = jnp.zeros((2, 2))
    y = jnp.ones((2, 2))
    base = float(L.bce_with_logits(logits, y))
    weighted = float(L.bce_with_logits(logits, y, pos_weight=jnp.full(2, 2.0)))
    assert abs(weighted - 2 * base) < 1e-6


def test_focal_reduces_easy_examples():
    y = jnp.array([[1.0]])
    easy = jnp.array([[4.0]])  # confident correct
    hard = jnp.array([[-4.0]])  # confident wrong
    f_easy = float(L.focal_loss(easy, y, gamma=2.0))
    b_easy = float(L.bce_with_logits(easy, y))
    assert f_easy < b_easy  # easy downweighted
    f_hard = float(L.focal_loss(hard, y, gamma=2.0))
    b_hard = float(L.bce_with_logits(hard, y))
    assert f_hard / max(b_hard, 1e-9) > f_easy / max(b_easy, 1e-9)


def test_hybrid_is_convex_combo(rng):
    logits = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    y = jnp.asarray((rng.random((4, 3)) < 0.5), jnp.float32)
    b = float(L.bce_with_logits(logits, y))
    f = float(L.focal_loss(logits, y, 1.0))
    h = float(L.hybrid_bce_focal(logits, y, focal_ratio=0.3, gamma=1.0))
    assert abs(h - (0.7 * b + 0.3 * f)) < 1e-5


def test_info_nce_perfect_alignment_is_low(rng):
    a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    aligned = float(L.info_nce(a, a, temperature=0.1))
    shuffled = float(L.info_nce(a, a[::-1], temperature=0.1))
    assert aligned < shuffled


def test_info_nce_valid_mask(rng):
    a = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    # padded rows must not change the loss over valid rows
    full = float(L.info_nce(a[:4], b[:4], 0.2))
    valid = jnp.array([1, 1, 1, 1, 0, 0], jnp.float32)
    masked = float(L.info_nce(a, b, 0.2, valid=valid))
    assert abs(full - masked) < 1e-5


def test_kg_alignment_cosine_zero_when_aligned(rng):
    B, D, Dk = 4, 8, 6
    emb = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, Dk)), jnp.float32)
    target = emb @ w  # exactly the projection -> cosine distance 0
    tv = jnp.ones(B)
    loss = float(L.kg_alignment_loss(emb, w, target, tv, "cosine"))
    assert loss < 1e-6
    # invalid targets excluded
    loss2 = float(
        L.kg_alignment_loss(emb, w, target * 0 + 1.0, tv * 0, "cosine")
    )
    assert loss2 == 0.0


def test_asymmetric_loss_focuses_negatives(rng):
    logits = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    y = jnp.asarray((rng.random((8, 4)) < 0.3), jnp.float32)
    v = float(L.asymmetric_loss(logits, y))
    assert np.isfinite(v) and v > 0


# ---------------- train step + multichip dryrun ----------------


def test_dryrun_multichip_8dev():
    import __graft_entry__ as G

    G.dryrun_multichip(8)


def test_dryrun_multichip_2dev(monkeypatch):
    # odd mesh shape check only needs the core sections; the 8dev test
    # above is the suite's one FULL dryrun (VERDICT r4 #9)
    monkeypatch.setenv("MMRP_DRYRUN_SECTIONS", "boot")
    import __graft_entry__ as G

    G.dryrun_multichip(2)


def test_train_step_reduces_loss(rng):
    """Overfit smoke test: a few steps on one tiny batch should reduce loss
    (the reference uses a 20-step single-batch overfit debug check,
    finetune_swin.py:570-660)."""
    import __graft_entry__ as G
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig
    from mmrp_tpu.train.joint import init_train_state, make_train_step

    swin = SwinConfig(img_size=28, embed_dim=16, depths=(1,), num_heads=(2,),
                      window_size=7, use_pallas=False)
    text = TextConfig.small(vocab_size=64, hidden_dim=16, num_layers=1,
                            num_heads=2, intermediate_dim=32, max_positions=16)
    mm = MultiModalConfig(swin=swin, text=text, joint_dim=16,
                          num_fusion_layers=1, num_heads=2, num_classes=43,
                          max_text_len=8)
    model = MultiModalRetrievalModel(mm)
    cfg = Config(lr=1e-3, batch_size=4)
    batch_np = G._example_batch(B=4, img=28, L=8, vocab=64, seed=5)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), batch, total_steps=50)
    step = make_train_step(model, cfg, donate=False)
    state, m0 = step(state, batch)
    for _ in range(8):
        state, m = step(state, batch)
    assert float(m["loss/total"]) < float(m0["loss/total"])
    assert np.isfinite(float(m["grad_norm"]))


def test_adam_mu_bf16_state_dtype_and_numerics(rng):
    """Config.adam_mu_bf16 stores Adam's first moment in bf16 (halves its
    HBM read/write in the memory-bound optimizer update) while keeping v in
    f32; a short training run must track the f32-m run closely."""
    import optax

    from mmrp_tpu.train.state import make_optimizer

    params = {"w": jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)}
    target = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)

    def run(mu_dtype, steps=10):
        tx = make_optimizer(1e-2, total_steps=100, mu_dtype=mu_dtype)
        opt_state = tx.init(params)
        p = params
        for _ in range(steps):
            g = jax.grad(lambda q: ((q["w"] - target) ** 2).mean())(p)
            upd, opt_state = tx.update(g, opt_state, p)
            p = optax.apply_updates(p, upd)
        return p, opt_state

    p32, _ = run(None)
    pbf, st = run(jnp.bfloat16)
    mus = [x for x in jax.tree.leaves(st) if hasattr(x, "dtype")]
    assert any(x.dtype == jnp.bfloat16 for x in mus)
    np.testing.assert_allclose(np.asarray(p32["w"]), np.asarray(pbf["w"]),
                               rtol=0.0, atol=3e-3)
