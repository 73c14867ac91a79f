from mmrp_tpu.data.dicom import (  # noqa: F401
    DICOMImagePreprocessor,
    DicomImage,
    read_dicom,
    write_dicom,
    window_image,
    percentile_window,
    load_raw_array,
)
from mmrp_tpu.data.labeler import PhraseLabeler  # noqa: F401
from mmrp_tpu.data.openi import parse_openi_xml, normalize_image_id  # noqa: F401
from mmrp_tpu.data.splits import train_val_test_split, multilabel_stratified_split  # noqa: F401
from mmrp_tpu.data.tokenizer import WordPieceTokenizer, load_or_train_tokenizer  # noqa: F401
from mmrp_tpu.data.dataset import (  # noqa: F401
    ChestXRDataset,
    BatchIterator,
    build_dataloader,
    inverse_frequency_weights,
    pos_weight_from_labels,
)
