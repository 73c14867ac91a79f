"""Explainability engine: attention maps, Integrated Gradients, Grad-CAM.

Capability parity with the reference ExplanationEngine (reference:
src/Model/explain.py:51-976) rebuilt on jax.grad / vmap / scan:

- **attention maps**: head- and layer-averaged cross-attention reductions
  (txt->img weighted by the token mask; img->txt salience), reshaped to the
  patch grid and bilinearly upsampled to image size; the final map blends
  0.6 * primary + 0.4 * secondary like the reference (explain.py:885-923);
- **Integrated Gradients** over the backbone patch features (the reference
  granularity, explain.py:302-427: captum interpolates ``img_patches`` and
  re-runs only fusion+classifier per step, with ``img_global`` recomputed as
  the patch mean, explain.py:137-156): the backbone runs ONCE, then a
  ``lax.scan`` over interpolation steps differentiates the feature-level
  head (``features=`` forward path in MultiModalRetrievalModel) — one
  compiled program instead of captum's per-step Python loop, and ~n_steps
  fewer backbone passes than naive pixel IG. Pixel-level IG through the
  full model is kept as ``integrated_gradients_pixels`` (a capability the
  reference lacks);
- **Grad-CAM** at the projected-patch level via the model's ``patch_delta``
  hook: weights = mean grad per channel, cam = ReLU(sum_c w_c * act_c)
  (explain.py:170-300);
- map comparison metrics Pearson / Spearman / IoU@k% (helper.py:173-209).

All engine outputs are numpy arrays shaped (H, W) in [0, 1].
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _normalize01(m: jnp.ndarray) -> jnp.ndarray:
    lo = m.min(axis=(-2, -1), keepdims=True)
    hi = m.max(axis=(-2, -1), keepdims=True)
    return (m - lo) / jnp.maximum(hi - lo, 1e-8)


def patch_vector_to_map(
    v: jnp.ndarray, grid: int, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """(..., grid*grid) -> (..., H, W) bilinear upsample, minmax to [0,1]."""
    m = v.reshape(v.shape[:-1] + (grid, grid))
    m = jax.image.resize(m, m.shape[:-2] + tuple(out_hw), method="bilinear")
    return _normalize01(m)


def _select_logits(logits: jnp.ndarray, target_idx) -> jnp.ndarray:
    """Scalar target -> one class for the whole batch; (B,) vector ->
    per-sample class (K retrieved items explained for their own top-1 in
    ONE batched program, reference app.py:449-630 runs K sequential
    predicts instead)."""
    t = jnp.asarray(target_idx)
    if t.ndim == 0:
        return logits[:, t].sum()
    return jnp.take_along_axis(logits, t[:, None], axis=1).sum()


def _attention_reductions(
    attn: Sequence[Dict[str, jnp.ndarray]],
    tmask: jnp.ndarray,
    out_hw: Tuple[int, int],
) -> Dict[str, jnp.ndarray]:
    """Layer/head-averaged cross-attention maps (reference
    explain.py:429-798,885-923). Pure jnp — usable eagerly
    (attention_maps) or inside a jitted program (explain_batch).

    Reductions are chosen to be non-degenerate under a MASKED softmax
    (our fusion masks padded keys, so every attention row sums to 1 over
    valid keys):

    - patch map from txt2img: attention each patch receives, averaged
      over valid query tokens (reference explain.py:481-484 mean-over-
      queries case) — varies per patch;
    - patch map from img2txt: per-patch MAX over tokens (concentration;
      the reference's supported "max" reduction, explain.py:471-479 —
      its "mean" flavor is constant 1/Lk once rows are re-normalized by
      a masked softmax, which the reference itself detects and drops via
      its constant-map fallback, explain.py:860-870);
    - token vector: attention each token receives from patch queries in
      img2txt (reference img2txt_to_token_vector, explain.py:721-737),
      NOT mean-over-patches of txt2img (constant 1/Np by row-stochastics).
    """
    n_patches = attn[0]["txt2img"].shape[-1]
    grid = int(round(n_patches**0.5))

    # txt->img: (B, h, Lt, Np) -> mask tokens -> mean heads+layers+tokens
    t2i = jnp.stack([a["txt2img"] for a in attn]).mean(axis=(0, 2))  # (B, Lt, Np)
    Lt = t2i.shape[1]
    w = tmask[:, :Lt]
    t2i = (t2i * w[:, :, None]).sum(1) / jnp.maximum(w.sum(1, keepdims=True), 1.0)

    # img->txt: per-patch concentration = max over (valid) tokens; padded
    # keys carry ~0 post-softmax mass so masking the max is a no-op.
    i2t = jnp.stack([a["img2txt"] for a in attn]).mean(axis=(0, 2))  # (B, Np, Lt)
    i2t_patch = i2t.max(axis=-1)  # (B, Np)

    primary = patch_vector_to_map(t2i, grid, out_hw)
    secondary = patch_vector_to_map(i2t_patch, grid, out_hw)
    final = _normalize01(0.6 * primary + 0.4 * secondary)  # explain.py:885-923

    # token-level attention (web demo token HTML): mass received from
    # patch queries, masked, max-normalized.
    tok = i2t.mean(axis=1)  # (B, Lt)
    tok = tok * w
    tok = tok / jnp.maximum(tok.max(axis=1, keepdims=True), 1e-8)
    return {
        "attn_txt2img": primary,
        "attn_img2txt": secondary,
        "attn_final": final,
        "token_attention": tok,
    }


def _resolve_chunk(n_steps: int, chunk: int) -> int:
    """Largest divisor of ``n_steps`` that is <= ``chunk`` (>= 1)."""
    c = max(1, min(int(chunk), int(n_steps)))
    while n_steps % c:
        c -= 1
    return c


def ig_patch_attribution(
    model,
    mp,
    feats: Dict[str, jnp.ndarray],
    ids: jnp.ndarray,
    mask: jnp.ndarray,
    targets,
    n_steps: int,
    chunk: int = 1,
    cls_global: bool = False,
) -> jnp.ndarray:
    """Patch-level IG core: (B, Np) L1 attribution over the embed dim.

    Reference semantics (explain.py:343-427 + :121-168): interpolate the
    raw backbone patches from a zero baseline, hold text features fixed,
    differentiate only the projection+fusion+classifier head (the
    ``features=`` forward path). ``chunk`` alphas are evaluated per scan
    step by folding them into the batch dimension (effective batch
    ``chunk * B``): same math, same total FLOPs, but the fusion-head
    GEMMs run at MXU-efficient row counts and the scan is ``n_steps /
    chunk`` sequential steps instead of ``n_steps`` — the win is largest
    at small serve-detail batches. ``chunk`` must divide ``n_steps``
    (callers resolve via ``_resolve_chunk``).

    ``cls_global``: vit-family backbones, where the global is the CLS
    token (interpolated alongside the patches), not the patch mean.
    """
    patches = feats["img_patches"].astype(jnp.float32)  # (B, Np, E)
    g0 = feats["img_global"].astype(jnp.float32)
    B = patches.shape[0]
    k = int(chunk)
    assert n_steps >= 1, n_steps
    assert n_steps % k == 0, (n_steps, k)

    def tile(x):
        return jnp.tile(x, (k,) + (1,) * (x.ndim - 1)) if k > 1 else x

    # img_patches/img_global are rebuilt per scan step (ipr / g below),
    # so only the text-side features are tiled
    featsr = {
        kk: tile(v) for kk, v in feats.items()
        if kk not in ("img_patches", "img_global")
    }
    idsr, maskr, g0r = tile(ids), tile(mask), tile(g0)
    t = jnp.asarray(targets)
    targetsr = jnp.tile(t, (k,)) if (k > 1 and t.ndim == 1) else t

    def logit_of(ipr, alphas_k):  # ipr: (k*B, Np, E); alphas_k: (k,)
        a = jnp.repeat(alphas_k, B)[:, None]
        g = g0r * a if cls_global else ipr.mean(axis=1)
        f = dict(featsr, img_patches=ipr, img_global=g)
        o = model.apply(mp, None, idsr, maskr, deterministic=True, features=f)
        return _select_logits(o["logits"], targetsr)

    grad_fn = jax.grad(logit_of)
    alphas = ((jnp.arange(n_steps) + 0.5) / n_steps).reshape(-1, k)

    def body(acc, alphas_k):
        ipr = (patches[None] * alphas_k[:, None, None, None]).reshape(
            (k * B,) + patches.shape[1:]
        )
        g = grad_fn(ipr, alphas_k).reshape((k, B) + patches.shape[1:]).sum(0)
        return acc + g, None

    total, _ = jax.lax.scan(body, jnp.zeros_like(patches), alphas)
    return jnp.abs(patches * total / n_steps).sum(-1)  # L1 over E


class ExplanationEngine:
    """Wraps (model, params). All heavy paths are jitted once per shape."""

    def __init__(self, model, params, image_hw: Optional[Tuple[int, int]] = None):
        self.model = model
        self.params = params
        self.image_hw = image_hw  # None -> use each input image's own H, W

        def fwd(params, image, ids, mask):
            return model.apply(
                {"params": params["model"]} if "model" in params else {"params": params},
                image, ids, mask, deterministic=True, return_attention=True,
            )

        self._fwd = jax.jit(fwd)
        self._ig = {}
        self._gradcam = {}
        self._full = {}
        self._tok_ig = {}

    def _hw(self, image) -> Tuple[int, int]:
        return tuple(self.image_hw) if self.image_hw else tuple(image.shape[1:3])

    # -- attention maps (explain.py:429-798) ---------------------------------

    def attention_maps(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
    ) -> Dict[str, np.ndarray]:
        out = self._fwd(
            self.params, jnp.asarray(image), jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
        )
        maps = _attention_reductions(
            out["attention"], jnp.asarray(attention_mask, jnp.float32),
            self._hw(image),
        )
        return {k: np.asarray(v) for k, v in maps.items()}

    # -- integrated gradients (explain.py:302-427) ------------------------------

    def integrated_gradients(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        target: int,
        n_steps: int = 50,
        chunk: int = 5,
    ) -> np.ndarray:
        """(B, H, W, 3) -> (B, H, W) attribution map, patch-feature IG.

        Reference semantics (explain.py:343-427 + :121-168): interpolate the
        raw backbone patches from a zero baseline, hold text features fixed,
        L1-reduce the attribution over the embed dim, grid-reshape,
        normalize, upsample. The backbone runs once; the scan differentiates
        only the projection+fusion+classifier head, ``chunk`` alphas per
        step folded into the batch dim (see ``ig_patch_attribution``).

        ``img_global`` along the path: for swin/resnet/efficientnet/medclip
        the model's global IS the patch mean (swin.py:523, resnet.py:87,
        efficientnet.py:117; medclip's bias-free linear head commutes with
        the mean), so it is recomputed as ``patches.mean(1)`` — exact at
        alpha=1 and gradients flow through the pooled path. For ``vit`` the
        global is the CLS token (vit.py:88), NOT a function of the patches:
        the true CLS vector is interpolated alongside the patches
        (``g0 * alpha``) so the head still sees the exact features at
        alpha=1; attribution remains over the patch path."""
        out_hw = self._hw(image)
        k = _resolve_chunk(n_steps, chunk)
        key = (n_steps, k, out_hw)
        if key not in self._ig:
            cls_global = self.model.config.vision_backbone == "vit"

            def ig_fn(params, image, ids, mask, target_idx):
                mp = {"params": params["model"]} if "model" in params else {"params": params}
                out = self.model.apply(
                    mp, image, ids, mask, deterministic=True,
                    return_features=True,
                )
                att = ig_patch_attribution(
                    self.model, mp, out["features"], ids, mask, target_idx,
                    n_steps, chunk=k, cls_global=cls_global,
                )
                grid = int(round(att.shape[-1] ** 0.5))
                return patch_vector_to_map(att, grid, out_hw)

            self._ig[key] = jax.jit(ig_fn)
        out = self._ig[key](
            self.params, jnp.asarray(image), jnp.asarray(input_ids),
            jnp.asarray(attention_mask), target,
        )
        return np.asarray(out)

    def integrated_gradients_pixels(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        target: int,
        n_steps: int = 50,
    ) -> np.ndarray:
        """(B, H, W, 3) -> (B, H, W) pixel-level IG through the FULL model
        (n_steps backbone fwd+bwd passes — ~n_steps x the cost of the
        patch-level default; finer maps, no reference counterpart)."""
        key = ("pixels", n_steps)
        if key not in self._ig:

            @jax.jit
            def ig_fn(params, image, ids, mask, target_idx):
                def logit_of(img):
                    out = self.model.apply(
                        {"params": params["model"]} if "model" in params else {"params": params},
                        img, ids, mask, deterministic=True,
                    )
                    return _select_logits(out["logits"], target_idx)

                grad_fn = jax.grad(logit_of)
                alphas = (jnp.arange(n_steps) + 0.5) / n_steps

                def body(acc, alpha):
                    g = grad_fn(image * alpha)
                    return acc + g, None

                total, _ = jax.lax.scan(body, jnp.zeros_like(image), alphas)
                ig = image * total / n_steps  # (B, H, W, 3)
                return _normalize01(jnp.abs(ig).sum(-1))

            self._ig[key] = ig_fn
        out = self._ig[key](
            self.params, jnp.asarray(image), jnp.asarray(input_ids),
            jnp.asarray(attention_mask), target,
        )
        return np.asarray(out)

    # -- grad-cam (explain.py:170-300) ----------------------------------------------

    def grad_cam(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        target: int,
    ) -> np.ndarray:
        out_hw = self._hw(image)
        if out_hw not in self._gradcam:

            @jax.jit
            def cam_fn(params, image, ids, mask, target_idx):
                mp = {"params": params["model"]} if "model" in params else {"params": params}

                # backbone once; the grad pass differentiates only the
                # projection+fusion+classifier head via the features path
                probe = self.model.apply(
                    mp, image, ids, mask, deterministic=True,
                    return_features=True,
                )
                feats = probe["features"]
                acts = probe["img_patches_proj"]

                def logit_of(delta):
                    out = self.model.apply(
                        mp, None, ids, mask, deterministic=True,
                        features=feats, patch_delta=delta,
                    )
                    return _select_logits(out["logits"], target_idx)

                grads = jax.grad(logit_of)(jnp.zeros_like(acts))
                weights = grads.mean(axis=1, keepdims=True)  # (B, 1, D)
                cam = jax.nn.relu((weights * acts).sum(-1))  # (B, Np)
                grid = int(round(cam.shape[-1] ** 0.5))
                return patch_vector_to_map(cam, grid, out_hw)

            self._gradcam[out_hw] = cam_fn
        out = self._gradcam[out_hw](
            self.params, jnp.asarray(image), jnp.asarray(input_ids),
            jnp.asarray(attention_mask), target,
        )
        return np.asarray(out)

    # -- token-level attribution (explain.py text-IG variants :302-427) --------

    def token_attribution(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        target: int,
        n_steps: int = 16,
    ) -> np.ndarray:
        """(B, Lt) normalized IG attribution over projected text tokens:
        a lax.scan over interpolation of the token-projection delta."""
        if n_steps not in self._tok_ig:

            @jax.jit
            def fn(params, image, ids, mask, target_idx):
                mp = {"params": params["model"]} if "model" in params else {"params": params}
                probe = self.model.apply(
                    mp, image, ids, mask, deterministic=True,
                    return_features=True,
                )
                feats = probe["features"]
                tokens = probe["txt_tokens_proj"]  # (B, Lt, D)

                def logit_of(delta):
                    out = self.model.apply(
                        mp, None, ids, mask, deterministic=True,
                        features=feats, txt_delta=delta,
                    )
                    return _select_logits(out["logits"], target_idx)

                grad_fn = jax.grad(logit_of)
                alphas = (jnp.arange(n_steps) + 0.5) / n_steps

                def body(acc, alpha):
                    # interpolate tokens from 0 -> actual via delta offset
                    return acc + grad_fn(tokens * (alpha - 1.0)), None

                total, _ = jax.lax.scan(body, jnp.zeros_like(tokens), alphas)
                ig = (tokens * total / n_steps).sum(-1)  # (B, Lt)
                ig = jnp.abs(ig) * mask[:, : ig.shape[1]]
                return ig / jnp.maximum(ig.max(axis=1, keepdims=True), 1e-8)

            self._tok_ig[n_steps] = fn
        return np.asarray(
            self._tok_ig[n_steps](
                self.params, jnp.asarray(image), jnp.asarray(input_ids),
                jnp.asarray(attention_mask), target,
            )
        )

    # -- combined single-forward explain ---------------------------------------

    def explain_batch(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        n_steps: int = 50,
        chunk: int = 10,
    ) -> Dict[str, np.ndarray]:
        """Everything the serve detail panel needs, ONE backbone forward.

        One jitted program: full forward (attention + raw features), probs,
        per-sample top-1 targets in-graph, then patch-level IG and Grad-CAM
        both reusing that forward's features — where calling embed /
        attention_maps / integrated_gradients / grad_cam separately pays
        FOUR backbone passes over the batch (reference app.py:449-630 runs
        K *sequential* full predicts instead). IG runs ``chunk`` alphas per
        scan step folded into the batch dim (the serve-detail batch is
        small — K=5 retrieved items — so the default is aggressive).
        Returns probs, joint_emb, targets, the attention_maps dict, "ig",
        and "grad_cam"."""
        out_hw = self._hw(image)
        k = _resolve_chunk(n_steps, chunk)
        key = (n_steps, k, out_hw)
        if key not in self._full:
            cls_global = self.model.config.vision_backbone == "vit"

            @jax.jit
            def full_fn(params, image, ids, mask):
                mp = {"params": params["model"]} if "model" in params else {"params": params}
                out = self.model.apply(
                    mp, image, ids, mask, deterministic=True,
                    return_attention=True, return_features=True,
                )
                maps = _attention_reductions(
                    out["attention"], jnp.asarray(mask, jnp.float32), out_hw
                )
                targets = jnp.argmax(out["logits"], axis=1)  # per-sample top-1

                feats = out["features"]
                att = ig_patch_attribution(
                    self.model, mp, feats, ids, mask, targets,
                    n_steps, chunk=k, cls_global=cls_global,
                )
                ig = patch_vector_to_map(
                    att, int(round(att.shape[-1] ** 0.5)), out_hw
                )

                acts = out["img_patches_proj"]

                def cam_logit(delta):
                    o = self.model.apply(
                        mp, None, ids, mask, deterministic=True,
                        features=feats, patch_delta=delta,
                    )
                    return _select_logits(o["logits"], targets)

                grads = jax.grad(cam_logit)(jnp.zeros_like(acts))
                weights = grads.mean(axis=1, keepdims=True)  # (B, 1, D)
                cam = jax.nn.relu((weights * acts).sum(-1))  # (B, Np)
                cam_map = patch_vector_to_map(
                    cam, int(round(cam.shape[-1] ** 0.5)), out_hw
                )
                return dict(
                    maps,
                    probs=jax.nn.sigmoid(out["logits"]),
                    joint_emb=out["joint_emb"],
                    targets=targets,
                    ig=ig,
                    grad_cam=cam_map,
                )

            self._full[key] = full_fn
        out = self._full[key](
            self.params, jnp.asarray(image), jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    # -- orchestration (explain.py:800-976) -------------------------------------------

    def explain(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        targets: Sequence[int],
        ig_steps: int = 50,
        include_ig: bool = True,
        include_gradcam: bool = True,
    ) -> Dict[str, Any]:
        maps = self.attention_maps(image, input_ids, attention_mask)
        per_target: Dict[Any, Dict[str, np.ndarray]] = {}
        for j, t in enumerate(targets):
            # scalar target -> one class for the whole batch (key = class
            # id); (B,) vector -> each sample attributed for its OWN class
            # (key = "rank{j}") — the batched-predict auto-target path
            t_arr = np.asarray(t)
            scalar = t_arr.ndim == 0
            tgt = int(t_arr) if scalar else t_arr
            entry: Dict[str, np.ndarray] = {}
            if include_ig:
                entry["ig"] = self.integrated_gradients(
                    image, input_ids, attention_mask, tgt, ig_steps
                )
            if include_gradcam:
                entry["grad_cam"] = self.grad_cam(
                    image, input_ids, attention_mask, tgt
                )
            per_target[int(t_arr) if scalar else f"rank{j}"] = entry
        return {"attention": maps, "per_target": per_target}


# ---------------------------------------------------------------------------
# Map comparison metrics (helper.py:173-209)
# ---------------------------------------------------------------------------


def _rankdata(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sx = x[order]
    n = len(x)
    i = 0
    vals = np.arange(1, n + 1, dtype=np.float64)
    while i < n:
        j = i
        while j + 1 < n and sx[j + 1] == sx[i]:
            j += 1
        vals[i : j + 1] = (i + j + 2) / 2.0
        i = j + 1
    ranks[order] = vals
    return ranks


def compare_maps(a: np.ndarray, b: np.ndarray, ious=(0.05, 0.2)) -> Dict[str, float]:
    """Pearson, Spearman, IoU of the top-k% pixels of two saliency maps."""
    fa, fb = a.ravel().astype(np.float64), b.ravel().astype(np.float64)
    out: Dict[str, float] = {}
    if fa.std() < 1e-12 or fb.std() < 1e-12:
        out["pearson"] = float("nan")
        out["spearman"] = float("nan")
    else:
        out["pearson"] = float(np.corrcoef(fa, fb)[0, 1])
        out["spearman"] = float(np.corrcoef(_rankdata(fa), _rankdata(fb))[0, 1])
    n = fa.size
    for frac in ious:
        k = max(1, int(n * frac))
        ta = set(np.argpartition(-fa, k - 1)[:k].tolist())
        tb = set(np.argpartition(-fb, k - 1)[:k].tolist())
        out[f"iou@{int(frac*100)}%"] = len(ta & tb) / len(ta | tb)
    return out
