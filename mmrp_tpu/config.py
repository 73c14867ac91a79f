"""Framework configuration.

Field-for-field parity with the reference Config (reference:
src/Helpers/config.py:6-185 — same names, defaults, validation, YAML loading
with type coercion / unknown-key warnings / defaults report, and the derived
``run_name``), plus a TPU block (mesh axes, dtype policy, static shape plans)
that the reference has no equivalent of (it is single-GPU PyTorch).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, asdict
from typing import Any, Dict, Optional, Tuple

import yaml


def _coerce(raw: Any, target_type: Any) -> Any:
    """Coerce a YAML scalar to the annotated field type (best effort)."""
    if raw is None:
        return None
    try:
        if target_type in ("float", float):
            return float(raw)
        if target_type in ("int", int):
            return int(raw)
        if target_type in ("bool", bool):
            if isinstance(raw, bool):
                return raw
            if isinstance(raw, str):
                return raw.strip().lower() in ("true", "1", "yes", "y")
            return bool(raw)
        if target_type in ("str", str):
            return str(raw)
    except (TypeError, ValueError):
        return raw
    return raw


@dataclass
class Config:
    # ---- training --------------------------------------------------------
    epochs: int = 50
    patience: int = 10
    batch_size: int = 32
    lr: float = 2e-5
    seed: int = 2709
    data_workers: int = 4        # host decode threads + prefetch (dataLoader.py:14)

    # ---- model -----------------------------------------------------------
    num_fusion_layers: int = 5
    use_focal: bool = False
    use_hybrid: bool = True
    image_backbone: str = "swin"        # swin | swin_tiny | resnet50 | medclip
    modality: str = "multimodal"        # multimodal | image | text (ref model.py:461-479)
    fusion_type: str = "cross"
    joint_dim: int = 1024
    num_heads: int = 8
    text_dim: int = 512                 # max text sequence length (reference reuse)
    use_shared_ffn: bool = False
    use_cls_only: bool = False

    # ---- knowledge graph ---------------------------------------------------
    kg_model: str = "TransE"            # TransE | TransH | RotatE | CompGCN
    kg_method: str = "cosine"           # alignment loss: cosine | mse
    kg_emb_dim: int = 300
    kg_epochs: int = 30
    kg_weight: float = 0.1
    kg_mode: str = "hybrid"             # dataset | ontology | hybrid
    kg_neg_size: int = 32
    kg_adv_temp: float = 0.1
    kg_use_amp: bool = True             # bf16 compute on TPU
    kg_lr: float = 1e-3

    # CompGCN-specific
    kg_num_layers: int = 2
    kg_dropout: float = 0.3
    kg_opn: str = "corr"                # sub | mult | corr

    # ---- losses ------------------------------------------------------------
    cls_weight: float = 3.0
    cont_weight: float = 0.3
    weight_img_joint: float = 0.5
    weight_text_joint: float = 0.5
    gamma_focal: float = 1.0
    focal_ratio: float = 0.3
    temperature: float = 0.125

    # ---- label-attention head ----------------------------------------------
    la_hidden_dim: int = 256
    la_batch_size: int = 128
    la_epochs: int = 30
    la_lr: float = 5e-4
    la_patience: int = 5
    la_ice_weight: float = 1.0
    la_tpl_weight: float = 0.5
    la_bce_weight: float = 0.1

    # ---- staged pipeline (reference train.py:304-360) ----------------------
    run_swin_finetune: bool = True      # stage 1: label-aware Swin finetune
    swin_finetune_epochs: int = 12
    swin_finetune_lr: float = 1e-4
    run_label_attention: bool = True    # LabelAttention pooling head stage

    # ---- pretrained bootstrap (reference fusion.py:92-99, 313-325) ---------
    # Empty string = train from scratch with the corpus WordPiece vocab.
    # pretrained_vocab: a BERT vocab.txt — REQUIRED when pretrained_bert is
    # set (token ids must match the ported embedding table).
    # pretrained_bert / pretrained_swin: an HF model directory/name
    # (transformers AutoModel) or a torch state-dict file (.pt/.bin/.pth).
    pretrained_vocab: str = ""
    pretrained_bert: str = ""
    pretrained_swin: str = ""

    # ---- resume ------------------------------------------------------------
    resume: bool = False                # resume joint stage from last full-state ckpt

    # ---- sampling ------------------------------------------------------------
    pos_weight_clamp_max: float = 1.0

    # ---- experiment tracking ---------------------------------------------
    project_name: str = "mmrp-tpu"

    # ---- retrieval ---------------------------------------------------------
    retrieval_backend: str = "exact"    # exact (sharded top-K) | dls (parity engine)
    retrieval_max_links: int = 10       # DLS link fan-out
    retrieval_link_threshold: float = 0.3
    rerank_alpha: float = 0.6           # embedding cosine weight
    rerank_beta: float = 0.25           # label Jaccard weight
    rerank_gamma: float = 0.15          # KG cosine weight

    # ---- TPU / parallelism (no reference equivalent) ----------------------
    mesh_shape: str = "auto"            # "auto" | "dp=8" | "dp=4,tp=2" ...
    dtype_policy: str = "bf16"          # bf16 | f32  (params f32, compute bf16)
    image_size: int = 224
    augment: bool = False               # on-device rotation/flip (tensorDICOM.py:41-45)
    bench_text_len: int = 128           # static text length used for benchmarks
    gallery_shard_axis: str = "dp"
    use_pallas_attention: bool = True
    # TRAINING attention path. Measured (BENCH_TRAIN b128_mu vs b128_mu_xla,
    # back-to-back): plain-XLA autodiff beats the Pallas kernels' custom-VJP
    # forward-recompute by +11.5% step throughput — the kernels' forward win
    # cannot cover the extra forward pass the VJP recomputes
    # (docs/ROOFLINE.md §7). Serving keeps use_pallas_attention.
    train_use_pallas_attention: bool = False
    remat_backbone: bool = False
    adam_mu_bf16: bool = True           # Adam first moment in bf16 (halves
    #   the m read/write HBM traffic of the memory-bound optimizer update;
    #   v stays f32 — see train/state.py::make_optimizer)
    # serving precision: "none" = bf16; "int8" = the measured-optimum W8A8
    # mix (fusion stack + BERT in-kernel/FFN int8, Swin bf16 — ops/quant.py,
    # fidelity gates in tests/test_quant_model.py); "int8_static" = that
    # mix PLUS static-scale int8 in the Swin whole-block kernel (weights
    # pre-quantized, activation scales from swin_act_amax_path — fidelity
    # gate at flagship widths in tests/test_quant_static.py).
    # Inference-only: training always runs full precision.
    serve_quant: str = "none"
    # calibration artifact for serve_quant="int8_static": JSON written by
    # models/quant_calib.py::save_act_amax. None = dynamic per-row
    # activation scales (weights still static int8).
    swin_act_amax_path: Optional[str] = None

    # auto-generated
    run_name: str = field(init=False, default="")

    def __post_init__(self) -> None:
        if self.use_hybrid:
            method = "hybrid(bce_focal)"
        elif self.use_focal:
            method = "focal"
        else:
            method = "bce"
        self._set_run_name(method)
        self.validate()

    # -- run name -----------------------------------------------------------
    def _set_run_name(self, method: str) -> None:
        skip = {"run_name", "project_name"}
        parts = [f"method={method}", f"kg_model={self.kg_model}"]
        if self.kg_model == "CompGCN":
            parts.append(f"kg_opn={self.kg_opn}")
        for fld in fields(self):
            if not fld.init or fld.name in skip or fld.name in ("kg_model", "kg_opn"):
                continue
            v = getattr(self, fld.name)
            if isinstance(v, float):
                parts.append(f"{fld.name}={v:.0e}" if "lr" in fld.name else f"{fld.name}={v:.4f}")
            else:
                parts.append(f"{fld.name}={v}")
        self.run_name = "_".join(parts)

    # -- validation ----------------------------------------------------------
    def validate(self) -> None:
        if not (isinstance(self.lr, (int, float)) and self.lr >= 0.0):
            raise ValueError(f"lr must be non-negative, got {self.lr!r}")
        if not (isinstance(self.batch_size, int) and self.batch_size > 0):
            raise ValueError(f"batch_size must be > 0, got {self.batch_size!r}")
        if not (isinstance(self.epochs, int) and self.epochs > 0):
            raise ValueError(f"epochs must be > 0, got {self.epochs!r}")
        if not (isinstance(self.temperature, (int, float)) and self.temperature > 0.0):
            raise ValueError(f"temperature must be > 0, got {self.temperature!r}")
        if self.modality not in ("multimodal", "image", "text"):
            raise ValueError(f"invalid modality: {self.modality!r}")
        if self.kg_model not in ("TransE", "TransH", "RotatE", "CompGCN"):
            raise ValueError(f"invalid kg_model: {self.kg_model!r}")
        if self.kg_mode not in ("dataset", "ontology", "hybrid"):
            raise ValueError(f"invalid kg_mode: {self.kg_mode!r}")
        if self.kg_opn not in ("sub", "mult", "corr"):
            raise ValueError(f"invalid kg_opn: {self.kg_opn!r}")
        if self.dtype_policy not in ("bf16", "f32"):
            raise ValueError(f"invalid dtype_policy: {self.dtype_policy!r}")
        if self.retrieval_backend not in ("exact", "dls"):
            raise ValueError(f"invalid retrieval_backend: {self.retrieval_backend!r}")
        if self.pretrained_bert and not self.pretrained_vocab:
            raise ValueError(
                "pretrained_bert requires pretrained_vocab: the corpus-trained "
                "WordPiece ids are incompatible with a ported embedding table"
            )

    # -- KG kwargs ------------------------------------------------------------
    @property
    def kg_model_kwargs(self) -> Dict[str, Any]:
        if self.kg_model == "CompGCN":
            return {
                "num_layers": self.kg_num_layers,
                "dropout": self.kg_dropout,
                "opn": self.kg_opn,
            }
        return {}

    # -- mesh parsing ----------------------------------------------------------
    def parse_mesh_shape(self, n_devices: int) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
        """Resolve ``mesh_shape`` into (axis_names, axis_sizes) for n_devices."""
        if self.mesh_shape == "auto":
            return ("dp",), (n_devices,)
        names, sizes = [], []
        for part in self.mesh_shape.split(","):
            k, _, v = part.partition("=")
            names.append(k.strip())
            sizes.append(int(v))
        total = 1
        for s in sizes:
            total *= s
        if total != n_devices:
            raise ValueError(
                f"mesh_shape {self.mesh_shape!r} wants {total} devices, have {n_devices}"
            )
        return tuple(names), tuple(sizes)

    # -- YAML ----------------------------------------------------------------
    @staticmethod
    def load(path: str) -> "Config":
        with open(path, "r", encoding="utf-8") as fh:
            raw = yaml.safe_load(fh) or {}
        if not isinstance(raw, dict):
            raise ValueError("Config file must contain a mapping.")
        field_map = {f.name: f for f in fields(Config) if f.init}
        unknown = sorted(set(raw) - set(field_map))
        if unknown:
            print(f"[WARN] Unknown keys in config file (ignored): {unknown}")
        data: Dict[str, Any] = {}
        used_defaults = []
        for name, fld in field_map.items():
            if name in raw:
                data[name] = _coerce(raw[name], fld.type)
            else:
                data[name] = fld.default
                used_defaults.append(name)
        cfg = Config(**data)
        if used_defaults:
            print("Using default values for:", ", ".join(used_defaults))
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)
