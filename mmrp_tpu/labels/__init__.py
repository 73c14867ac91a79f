from mmrp_tpu.labels.taxonomy import (  # noqa: F401
    LabelTaxonomy,
    get_taxonomy,
    LABEL_COLS,
    NUM_CLASSES,
)
