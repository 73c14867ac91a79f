from mmrp_tpu.kg.builder import KGBuilder  # noqa: F401
from mmrp_tpu.kg.models import KGModelConfig, init_params, make_score_fn, make_score_all_fn  # noqa: F401
from mmrp_tpu.kg.trainer import KGTrainer, KGTrainerConfig  # noqa: F401
from mmrp_tpu.kg.label_attention import LabelAttention, LabelAttentionTrainer  # noqa: F401
from mmrp_tpu.kg.ontology import OntologyMapper, run_mapper  # noqa: F401
from mmrp_tpu.kg.sharded_eval import evaluate_sharded, make_sharded_rank_fn  # noqa: F401
