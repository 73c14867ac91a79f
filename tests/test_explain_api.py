import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.api import MMRPredictor
from mmrp_tpu.models.explain import ExplanationEngine, compare_maps, patch_vector_to_map
from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.models.text_encoder import TextConfig
from mmrp_tpu.ops.preprocess import augment_batch, preprocess_batch
from mmrp_tpu.retrieval.gallery import RetrievalEngine
from mmrp_tpu.retrieval.rerank import Reranker

MICRO_SWIN = SwinConfig(img_size=28, embed_dim=16, depths=(1,), num_heads=(2,),
                        window_size=7, use_pallas=False)
MICRO_TEXT = TextConfig.small(vocab_size=64, hidden_dim=16, num_layers=1,
                              num_heads=2, intermediate_dim=32, max_positions=16)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(2709)  # module fixture: own stream
    cfg = MultiModalConfig(swin=MICRO_SWIN, text=MICRO_TEXT, joint_dim=16,
                           num_fusion_layers=1, num_heads=2, num_classes=8,
                           max_text_len=8)
    model = MultiModalRetrievalModel(cfg)
    img = jnp.asarray(rng.random((2, 28, 28, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = {"model": model.init(jax.random.PRNGKey(0), img, ids, mask)["params"]}
    return model, params, np.asarray(img), np.asarray(ids), np.asarray(mask)


def test_preprocess_batch_matches_host_math(rng):
    raw = rng.random((2, 32, 40)).astype(np.float32) * 1000
    wc = np.array([400.0, 500.0], np.float32)
    ww = np.array([800.0, 600.0], np.float32)
    out = np.asarray(preprocess_batch(jnp.asarray(raw), jnp.asarray(wc),
                                      jnp.asarray(ww), out_hw=(16, 16)))
    assert out.shape == (2, 16, 16, 3)
    # normalized range: ((x in [0,1]) - .5)/.5 in [-1, 1]
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(out[..., 0], out[..., 1])


def test_augment_batch_shapes_and_flip(rng):
    imgs = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
    out = augment_batch(imgs, jax.random.PRNGKey(0), max_rotate_deg=0.0,
                        hflip_prob=1.0)
    # pure flip with 0 rotation: exact horizontal mirror
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs[:, :, ::-1, :]),
                               atol=1e-5)


def test_patch_vector_to_map():
    v = jnp.zeros((1, 49)).at[0, 24].set(1.0)  # center patch
    m = np.asarray(patch_vector_to_map(v, 7, (28, 28)))
    assert m.shape == (1, 28, 28)
    assert abs(m[0].argmax() // 28 - 14) <= 3 and abs(m[0].argmax() % 28 - 14) <= 3
    assert m.min() >= 0 and m.max() <= 1.0 + 1e-6


def test_attention_maps(setup):
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    maps = eng.attention_maps(img, ids, mask)
    assert maps["attn_final"].shape == (2, 28, 28)
    assert maps["token_attention"].shape == (2, 8)
    for k in ("attn_txt2img", "attn_img2txt", "attn_final"):
        m = maps[k]
        assert np.isfinite(m).all()
        assert m.min() >= 0 and m.max() <= 1.0 + 1e-5


def test_integrated_gradients(setup):
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    ig = eng.integrated_gradients(img, ids, mask, target=3, n_steps=8)
    assert ig.shape == (2, 28, 28)
    assert np.isfinite(ig).all()
    # IG completeness-ish sanity: map not constant
    assert ig.std() > 0


def test_features_path_matches_full_forward(setup):
    """The features= forward (backbone skipped) must reproduce the full
    forward exactly when fed that forward's own raw backbone outputs —
    the contract the patch-level IG scan relies on."""
    model, params, img, ids, mask = setup
    mp = {"params": params["model"]}
    full = model.apply(mp, jnp.asarray(img), jnp.asarray(ids),
                       jnp.asarray(mask), return_features=True)
    head = model.apply(mp, None, jnp.asarray(ids), jnp.asarray(mask),
                       features=full["features"])
    np.testing.assert_allclose(np.asarray(head["logits"]),
                               np.asarray(full["logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(head["joint_emb"]),
                               np.asarray(full["joint_emb"]), atol=1e-5)


def test_patch_ig_matches_manual_loop(setup):
    """Engine patch-level IG == a hand-rolled per-step Python loop with the
    reference's semantics (interpolate raw patches, img_global = patch
    mean, text fixed, L1 over embed dim)."""
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    n_steps, target = 4, 3
    got = eng.integrated_gradients(img, ids, mask, target=target,
                                   n_steps=n_steps)

    mp = {"params": params["model"]}
    full = model.apply(mp, jnp.asarray(img), jnp.asarray(ids),
                       jnp.asarray(mask), return_features=True)
    feats = full["features"]
    patches = feats["img_patches"].astype(jnp.float32)

    def logit_of(ip):
        f = dict(feats, img_patches=ip, img_global=ip.mean(axis=1))
        o = model.apply(mp, None, jnp.asarray(ids), jnp.asarray(mask),
                        features=f)
        return o["logits"][:, target].sum()

    total = jnp.zeros_like(patches)
    for s in range(n_steps):
        alpha = (s + 0.5) / n_steps
        total = total + jax.grad(logit_of)(patches * alpha)
    att = jnp.abs(patches * total / n_steps).sum(-1)
    want = np.asarray(patch_vector_to_map(att, int(round(att.shape[-1] ** 0.5)),
                                          (28, 28)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pixel_ig_variant(setup):
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    ig = eng.integrated_gradients_pixels(img, ids, mask, target=3, n_steps=4)
    assert ig.shape == (2, 28, 28)
    assert np.isfinite(ig).all() and ig.std() > 0


def test_grad_cam(setup):
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    cam = eng.grad_cam(img, ids, mask, target=1)
    assert cam.shape == (2, 28, 28)
    assert np.isfinite(cam).all() and cam.min() >= 0


def test_explain_orchestration(setup):
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    out = eng.explain(img, ids, mask, targets=[0, 2], ig_steps=4)
    assert set(out["per_target"]) == {0, 2}
    assert "ig" in out["per_target"][0] and "grad_cam" in out["per_target"][0]


def test_compare_maps_metrics(rng):
    a = rng.random((14, 14))
    same = compare_maps(a, a.copy())
    assert abs(same["pearson"] - 1.0) < 1e-9
    assert abs(same["spearman"] - 1.0) < 1e-9
    assert same["iou@5%"] == 1.0
    b = rng.random((14, 14))
    diff = compare_maps(a, b)
    assert diff["pearson"] < 0.9
    const = compare_maps(a, np.ones_like(a))
    assert np.isnan(const["pearson"])


def test_predictor_end_to_end(setup, rng):
    model, params, img, ids, mask = setup
    labels = [f"c{i}" for i in range(8)]
    gallery = rng.standard_normal((30, 16)).astype(np.float32)
    gids = [f"g{i}" for i in range(30)]
    retriever = RetrievalEngine(gallery, gids)
    labels_by_id = {g: (rng.random(8) < 0.3).astype(int) for g in gids}
    rr = Reranker(labels_by_id=labels_by_id)
    pred = MMRPredictor(model, params, labels, retriever, rr, threshold=0.5)

    emb = pred.embed(img, ids, mask)
    assert emb["joint_emb"].shape == (2, 16)
    assert emb["probs"].shape == (2, 8)

    res = pred.predict(img, ids, mask, K=5, explain=False)
    assert len(res["top_labels"][0]) == 5
    assert len(res["retrieval"]) == 2
    assert len(res["retrieval"][0]) == 5
    # reranked hits come from the gallery
    assert all(h[0] in set(gids) for h in res["retrieval"][0])

    res2 = pred.predict(img, ids, mask, K=3, explain=True, explain_targets=[0])
    assert 0 in res2["explanation"]["per_target"]


def test_token_attribution(setup):
    model, params, img, ids, mask = setup
    from mmrp_tpu.models.explain import ExplanationEngine

    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    attr = eng.token_attribution(img, ids, mask, target=2, n_steps=4)
    assert attr.shape == (2, 8)
    assert np.isfinite(attr).all()
    assert attr.min() >= 0 and attr.max() <= 1.0 + 1e-5


def test_patch_ig_cls_global_backbone(rng):
    """For a CLS-pooled backbone (vit) img_global is NOT the patch mean
    (vit.py:88): the IG path must interpolate the TRUE global alongside the
    patches (g0 * alpha) so the head sees the exact features at alpha=1
    (regression: recomputing global as ip.mean attributed a different
    function — silently wrong saliency for vit/medclip-family towers)."""
    cfg = MultiModalConfig(
        swin=SwinConfig(img_size=32, embed_dim=16, depths=(1,), num_heads=(2,),
                        window_size=7, use_pallas=False),
        text=MICRO_TEXT, vision_backbone="vit", joint_dim=16,
        num_fusion_layers=1, num_heads=2, num_classes=8, max_text_len=8,
    )
    model = MultiModalRetrievalModel(cfg)
    img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = {"model": model.init(jax.random.PRNGKey(0), img, ids, mask)["params"]}

    eng = ExplanationEngine(model, params, image_hw=(32, 32))
    n_steps, target = 4, 3
    got = eng.integrated_gradients(np.asarray(img), np.asarray(ids),
                                   np.asarray(mask), target=target,
                                   n_steps=n_steps)
    assert got.shape == (2, 32, 32)
    assert np.isfinite(got).all()

    mp = {"params": params["model"]}
    full = model.apply(mp, img, ids, mask, return_features=True)
    feats = full["features"]
    patches = feats["img_patches"].astype(jnp.float32)
    g0 = feats["img_global"].astype(jnp.float32)

    def logit_of(ip, alpha):
        f = dict(feats, img_patches=ip, img_global=g0 * alpha)
        o = model.apply(mp, None, ids, mask, features=f)
        return o["logits"][:, target].sum()

    total = jnp.zeros_like(patches)
    for s in range(n_steps):
        alpha = (s + 0.5) / n_steps
        total = total + jax.grad(logit_of)(patches * alpha, alpha)
    att = jnp.abs(patches * total / n_steps).sum(-1)
    want = np.asarray(patch_vector_to_map(att, int(round(att.shape[-1] ** 0.5)),
                                          (32, 32)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ig_chunked_matches_sequential(setup):
    """Folding k alphas into the batch dim must not change the IG map:
    chunk=1 (the original sequential scan) vs chunk=2 and chunk=4 on the
    same 4-step path."""
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    base = eng.integrated_gradients(img, ids, mask, 1, n_steps=4, chunk=1)
    for k in (2, 4):
        got = eng.integrated_gradients(img, ids, mask, 1, n_steps=4, chunk=k)
        np.testing.assert_allclose(got, base, atol=2e-4)


def test_ig_chunked_vector_targets_match_sequential(setup):
    """Per-sample VECTOR targets through the chunked path: the alpha
    repeat (chunk-major) and target tile pairing must keep each sample
    attributed for its own class — chunk=1 vs chunk=2/4 must agree.
    Guards the jnp.repeat(alphas)/jnp.tile(targets) ordering, where a
    swap would silently pair sample i with another sample's alpha or
    target."""
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    targets = np.arange(img.shape[0]) % 3  # distinct per-sample classes
    base = eng.integrated_gradients(img, ids, mask, targets, n_steps=4,
                                    chunk=1)
    for k in (2, 4):
        got = eng.integrated_gradients(img, ids, mask, targets, n_steps=4,
                                       chunk=k)
        np.testing.assert_allclose(got, base, atol=2e-4)


def test_explain_batch_matches_separate_calls(setup):
    """The single-forward combined program (serve detail path) must equal
    the separate attention_maps / integrated_gradients / grad_cam calls
    and the model's own probs, for each sample's top-1 target."""
    model, params, img, ids, mask = setup
    eng = ExplanationEngine(model, params, image_hw=(28, 28))
    full = eng.explain_batch(img, ids, mask, n_steps=4)

    want_logits = model.apply({"params": params["model"]}, jnp.asarray(img),
                              jnp.asarray(ids), jnp.asarray(mask))["logits"]
    targets = np.argmax(np.asarray(want_logits), axis=1)
    np.testing.assert_array_equal(full["targets"], targets)
    np.testing.assert_allclose(
        full["probs"], np.asarray(jax.nn.sigmoid(want_logits)), atol=1e-5)

    attn = eng.attention_maps(img, ids, mask)
    for k in ("attn_txt2img", "attn_img2txt", "attn_final", "token_attention"):
        np.testing.assert_allclose(full[k], attn[k], atol=1e-5)

    ig = eng.integrated_gradients(img, ids, mask, targets, n_steps=4)
    np.testing.assert_allclose(full["ig"], ig, atol=2e-4)
    cam = eng.grad_cam(img, ids, mask, targets)
    np.testing.assert_allclose(full["grad_cam"], cam, atol=2e-4)
