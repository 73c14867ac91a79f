"""Joint multi-modal training: loss assembly + sharded train step.

The compute contract mirrors the reference trainer's stage-3 loss
(reference: src/Trainner/train.py:555-611):

    loss = cls_weight * hybrid(BCE+focal, pos_weight)
         + cont_weight * ( InfoNCE(img, txt)
                         + weight_img_joint * InfoNCE(img, joint)
                         + weight_text_joint * InfoNCE(txt, joint) )
         + kg_weight * kg_alignment(joint -> proj_to_kg, kg_targets)

TPU-first differences: the whole step (forward, all losses, backward,
optimizer) is ONE jitted SPMD program over the device mesh — batch sharded
on the data axis, wide matmuls optionally tensor-parallel
(parallel/mesh.py) — where the reference runs eager CUDA ops with
host-side Python between them. KG targets arrive as dense per-sample
vectors from the pipeline instead of per-sample dict lookups inside the
loss (helper.py:577-601, a CPU bottleneck noted in SURVEY §3.2).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmrp_tpu.config import Config
from mmrp_tpu.models.multimodal import MultiModalRetrievalModel
from mmrp_tpu.train import losses as L
from mmrp_tpu.train.state import TrainState, make_optimizer


def init_train_state(
    model: MultiModalRetrievalModel,
    cfg: Config,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
    total_steps: int = 10_000,
    kg_dim: Optional[int] = None,
) -> TrainState:
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)
    model_params = model.init(
        {"params": p_rng, "dropout": d_rng},
        sample_batch["image"],
        sample_batch["input_ids"],
        sample_batch["attention_mask"],
        deterministic=True,
    )["params"]
    params = {"model": model_params}
    if kg_dim:
        joint_dim = model.config.joint_dim
        params["kg_proj"] = (
            jax.random.normal(s_rng, (joint_dim, kg_dim), jnp.float32)
            * (1.0 / np.sqrt(joint_dim))
        )
    tx = make_optimizer(
        cfg.lr,
        total_steps,
        mu_dtype=jnp.bfloat16 if getattr(cfg, "adam_mu_bf16", False) else None,
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        base_rng=jax.random.PRNGKey(cfg.seed),
    )


def compute_losses(
    model: MultiModalRetrievalModel,
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    cfg: Config,
    pos_weight: Optional[jnp.ndarray],
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    image = batch["image"]
    if not deterministic and getattr(cfg, "augment", False):
        from mmrp_tpu.ops.preprocess import augment_batch

        rng, aug_rng = jax.random.split(rng)
        image = augment_batch(image, aug_rng)
    out = model.apply(
        {"params": params["model"]},
        image,
        batch["input_ids"],
        batch["attention_mask"],
        deterministic=deterministic,
        rngs=None if deterministic else {"dropout": rng},
    )
    return assemble_losses(params, out, batch, cfg, pos_weight)


def assemble_losses(
    params: Dict[str, Any],
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg: Config,
    pos_weight: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss assembly from model outputs (shared by the plain-jit step and
    the shard_map DP step, which assembles over all-gathered outputs)."""
    valid = batch.get("valid")
    labels = batch["labels"]

    if cfg.use_hybrid:
        cls_loss = L.hybrid_bce_focal(
            out["logits"], labels, cfg.focal_ratio, cfg.gamma_focal, pos_weight, valid
        )
    elif cfg.use_focal:
        cls_loss = L.focal_loss(out["logits"], labels, cfg.gamma_focal, valid)
    else:
        cls_loss = L.bce_with_logits(out["logits"], labels, pos_weight, valid)

    nce_it = L.info_nce(out["img_emb"], out["txt_emb"], cfg.temperature, valid)
    nce_ij = L.info_nce(out["img_emb"], out["joint_emb"], cfg.temperature, valid)
    nce_tj = L.info_nce(out["txt_emb"], out["joint_emb"], cfg.temperature, valid)
    cont_loss = nce_it + cfg.weight_img_joint * nce_ij + cfg.weight_text_joint * nce_tj

    total = cfg.cls_weight * cls_loss + cfg.cont_weight * cont_loss
    metrics = {
        "loss/cls": cls_loss,
        "loss/contrastive": cont_loss,
        "loss/nce_img_txt": nce_it,
    }

    if "kg_proj" in params and "kg_target" in batch:
        kg_loss = L.kg_alignment_loss(
            out["joint_emb"],
            params["kg_proj"],
            batch["kg_target"],
            batch.get("kg_target_valid", jnp.ones(labels.shape[0])),
            method=cfg.kg_method,
            valid=valid,
        )
        total = total + cfg.kg_weight * kg_loss
        metrics["loss/kg_align"] = kg_loss

    metrics["loss/total"] = total
    return total, metrics


def make_train_step(
    model: MultiModalRetrievalModel,
    cfg: Config,
    pos_weight: Optional[np.ndarray] = None,
    donate: bool = True,
) -> Callable:
    """Returns jittable fn(state, batch) -> (state, metrics)."""
    pw = None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng = state.step_rng()

        def loss_fn(params):
            return compute_losses(model, params, batch, rng, cfg, pw)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_step_dp(
    model: MultiModalRetrievalModel,
    cfg: Config,
    mesh,
    pos_weight: Optional[np.ndarray] = None,
    *,
    axis_name: str = "dp",
    donate: bool = True,
    core_kernel: Optional[bool] = None,
) -> Callable:
    """Data-parallel train step wrapped in ``shard_map`` so the Pallas
    kernels see PER-SHARD shapes (SURVEY §2.9/§5.8).

    Why this exists: the CORE window-attention kernel
    (ops/wattn_core.py, +20.5-33% flagship train) is a Pallas custom
    call, which plain GSPMD jit cannot partition across a >1-chip mesh —
    models/swin.py therefore gates it off whenever
    ``jax.device_count() > 1``. Wrapping the step in shard_map hands the
    kernel local shapes, so multi-chip training keeps the single-chip
    kernel win; ``core_kernel`` opts in via models/swin.py::force_core
    (default: ON when the backend is TPU, OFF elsewhere — interpret-mode
    kernels are for tests).

    Numerics contract: identical to the plain-jit GSPMD step
    (tests/test_train_dp.py asserts updated params match). The
    batch-coupled losses (in-batch InfoNCE negatives, global masked
    means) are preserved by assembling the loss from ALL-GATHERED model
    outputs: every shard computes the identical GLOBAL loss, and because
    the all_gather transpose (psum_scatter) sums the n identical
    cotangents, the local grads come out exactly n x the true per-shard
    contribution — ``psum(grads) / n`` recovers the exact global
    gradient with no loss-function rewrites. The gathered tensors are
    (B, joint_dim)-sized embeddings and logits, so the extra ICI traffic
    is O(B * D) per step, and the redundant global loss assembly is
    elementwise + (B, B) GEMMs — noise next to the backbone.

    Note on stochastic layers: each shard draws dropout/augment noise
    from the SAME per-step key over its LOCAL batch shape, so masks
    differ from the single-program run (same distribution; exact
    equality tests use dropout 0 / augment off).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mmrp_tpu.models import swin as swin_mod

    pw = None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)
    if core_kernel is None:
        core_kernel = jax.default_backend() == "tpu"
    n_shards = mesh.shape[axis_name]
    _GATHER_BATCH = ("labels", "valid", "kg_target", "kg_target_valid")

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng = state.step_rng()

        def loss_fn(params):
            image = batch["image"]
            loss_rng = rng
            if getattr(cfg, "augment", False):
                from mmrp_tpu.ops.preprocess import augment_batch

                loss_rng, aug_rng = jax.random.split(rng)
                image = augment_batch(image, aug_rng)
            with swin_mod.force_core(core_kernel):
                out = model.apply(
                    {"params": params["model"]},
                    image,
                    batch["input_ids"],
                    batch["attention_mask"],
                    deterministic=False,
                    rngs={"dropout": loss_rng},
                )

            def gather(x):
                return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)

            gout = {
                k: gather(out[k])
                for k in ("logits", "img_emb", "txt_emb", "joint_emb")
            }
            gbatch = {k: gather(batch[k]) for k in _GATHER_BATCH if k in batch}
            return assemble_losses(params, gout, gbatch, cfg, pw)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis_name) / n_shards, grads
        )
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    smapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model: MultiModalRetrievalModel, return_attention: bool = False
) -> Callable:
    """jitted fn(params, batch) -> {probs, joint_emb, img_emb, txt_emb
    [, patch_attention (B, Np)]}."""

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(
            {"params": params["model"]},
            batch["image"],
            batch["input_ids"],
            batch["attention_mask"],
            deterministic=True,
            return_attention=return_attention,
        )
        res = {
            "probs": jax.nn.sigmoid(out["logits"]),
            "joint_emb": out["joint_emb"],
            "img_emb": out["img_emb"],
            "txt_emb": out["txt_emb"],
        }
        if return_attention:
            # head/layer/token-averaged txt->img weights: (B, Np) — the
            # per-sample attention vector the reference persists at the
            # best epoch (train.py:730-734, 805-816)
            t2i = jnp.stack([a["txt2img"] for a in out["attention"]])
            w = batch["attention_mask"][:, : t2i.shape[3]].astype(t2i.dtype)
            t2i = t2i.mean(axis=(0, 2))  # (B, Lt, Np)
            t2i = (t2i * w[:, :, None]).sum(1) / jnp.maximum(
                w.sum(1, keepdims=True), 1.0
            )
            res["patch_attention"] = t2i
        return res

    return eval_step
