"""mmrp_tpu — TPU-native multi-modal chest X-ray retrieval & prediction framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the PyTorch
reference ``ppddddpp/multi-modal-retrieval-predict-project``:

- DICOM + OpenI XML ingestion with weak phrase-match labeling (own decoder +
  matcher; reference: src/DataHandler/tensorDICOM.py, dataParser.py).
- Joint image-text model: Flax Swin encoder with a Pallas windowed-attention
  kernel + a BERT-family text encoder + cross-modal fusion (reference:
  src/Model/fusion.py, model.py).
- Knowledge-graph embeddings (TransE/TransH/RotatE/CompGCN) over dataset +
  ontology triples (reference: src/KnowledgeGraph/).
- Sharded-gallery exact top-K retrieval over a device mesh + KG/label
  reranking (replaces reference's approximate DLS walk, src/Retrieval/).
- Explainability: attention maps, Integrated Gradients, Grad-CAM
  (reference: src/Model/explain.py) — implemented with jax.grad/vmap/scan.
- Evaluation suites, training loops, orbax checkpoints, and a stdlib web demo.

Public high-level API (parity with the reference's model-as-API surface):
``embed``, ``retrieve``, ``predict``, ``explain`` — see ``mmrp_tpu.api``.
"""

__version__ = "0.1.0"

from mmrp_tpu.config import Config  # noqa: F401


def __getattr__(name):  # lazy: keep bare `import mmrp_tpu` JAX-free
    if name == "MMRPredictor":
        from mmrp_tpu.api import MMRPredictor

        return MMRPredictor
    raise AttributeError(name)
