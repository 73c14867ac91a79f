from mmrp_tpu.retrieval.gallery import RetrievalEngine, topk_single, make_sharded_topk  # noqa: F401
from mmrp_tpu.retrieval.dls import DLSRetrievalEngine, make_retrieval_engine  # noqa: F401
from mmrp_tpu.retrieval.rerank import Reranker, minmax_scale, label_jaccard  # noqa: F401
