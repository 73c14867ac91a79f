import numpy as np

from mmrp_tpu.data import dicom as D
from mmrp_tpu.data.dataset import (
    BatchIterator,
    ChestXRDataset,
    build_dataloader,
    inverse_frequency_weights,
    pos_weight_from_labels,
)
from mmrp_tpu.data.tokenizer import WordPieceTokenizer
from mmrp_tpu.labels import NUM_CLASSES

CORPUS = [
    "the heart is enlarged with cardiomegaly",
    "no acute cardiopulmonary disease",
    "small right pleural effusion with atelectasis",
    "lungs are clear bilaterally no pneumothorax",
] * 5


def _tok():
    return WordPieceTokenizer.train(CORPUS, vocab_size=512, min_freq=1)


def test_encode_arbitrary_unicode_fuzz():
    """Serve accepts free-text queries: encode must stay well-formed on
    any input (ids in-vocab, mask consistent, fixed shape, no raise)."""
    import numpy as np

    tok = _tok()
    rng = np.random.default_rng(0)
    cases = ["", " ", "\x00\x01", "ß∂ƒ©˙∆˚¬", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "a" * 5000,
             "\n\t\r", "效果 效果", "🩻🩺", "-" * 99, "." * 101]
    cases += ["".join(chr(int(c)) for c in rng.integers(1, 0x10000, 40)
                      if int(c) not in range(0xD800, 0xE000))
              for _ in range(30)]
    V = len(tok.vocab)
    for text in cases:
        ids, mask = tok.encode(text, max_length=16)
        assert ids.shape == (16,) and mask.shape == (16,)
        assert ((ids >= 0) & (ids < V)).all()
        n = int(mask.sum())
        assert (mask[:n] == 1).all() and (mask[n:] == 0).all()
        assert ids[0] == tok.cls_id and ids[n - 1] == tok.sep_id
        assert (ids[n:] == tok.pad_id).all()


def test_tokenizer_roundtrip_known_words():
    tok = _tok()
    pieces = tok.tokenize("cardiomegaly effusion")
    assert "cardiomegaly" in pieces
    assert "effusion" in pieces


def test_tokenizer_subword_fallback():
    tok = _tok()
    pieces = tok.tokenize("pneumomediastinum")  # unseen word
    assert len(pieces) >= 1
    assert all(p == "[UNK]" or p.replace("##", "") for p in pieces)
    # never fails to produce ids
    ids, mask = tok.encode("zzzgibberishzzz qqq")
    assert ids.shape == (512,)


def test_encode_fixed_shape_and_mask():
    tok = _tok()
    ids, mask = tok.encode("the heart is enlarged", max_length=16)
    assert ids.shape == (16,) and mask.shape == (16,)
    n = int(mask.sum())
    assert ids[0] == tok.cls_id
    assert ids[n - 1] == tok.sep_id
    assert (ids[n:] == tok.pad_id).all()


def test_encode_truncation():
    tok = _tok()
    long_text = " ".join(["cardiomegaly"] * 100)
    ids, mask = tok.encode(long_text, max_length=10)
    assert ids.shape == (10,)
    assert int(mask.sum()) == 10


def test_vocab_save_load(tmp_path):
    tok = _tok()
    p = tmp_path / "vocab.txt"
    tok.save_vocab(str(p))
    tok2 = WordPieceTokenizer.from_vocab_file(str(p))
    assert tok2.vocab == tok.vocab


def _records(rng, n=10):
    recs = []
    for i in range(n):
        arr = (rng.random((48, 48)) * 1000).astype(np.uint16)
        blob = D.write_dicom(None, arr)
        vec = [0] * NUM_CLASSES
        vec[i % NUM_CLASSES] = 1
        recs.append(
            {
                "id": f"r{i}",
                "dicom_path": blob,  # bytes accepted by the decoder
                "report_text": CORPUS[i % len(CORPUS)],
                "labels": vec,
            }
        )
    return recs


def test_dataset_getitem(rng):
    ds = ChestXRDataset(_records(rng), _tok(), max_length=32, image_size=64)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)  # NHWC
    assert s["input_ids"].shape == (32,)
    assert s["labels"].shape == (NUM_CLASSES,)


def test_batch_iterator_fixed_shapes(rng):
    ds = ChestXRDataset(_records(rng, 10), _tok(), max_length=32, image_size=64)
    it = BatchIterator(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(it)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (4, 64, 64, 3)
        assert b["valid"].shape == (4,)
    # last batch padded: 10 = 4+4+2
    assert batches[-1]["valid"].sum() == 2


def test_weighted_sampler_prefers_rare(rng):
    labels = np.zeros((100, 2), np.float32)
    labels[:90, 0] = 1  # common class
    labels[90:, 1] = 1  # rare class
    w = inverse_frequency_weights(labels)
    assert w[95] > w[5]


def test_pos_weight_clamp():
    labels = np.zeros((100, 2), np.float32)
    labels[:5, 0] = 1
    labels[:50, 1] = 1
    pw = pos_weight_from_labels(labels, clamp_max=1.0)
    assert (pw <= 1.0).all()
    pw2 = pos_weight_from_labels(labels, clamp_max=30.0)
    assert pw2[0] == 19.0  # 95/5


def test_pos_weight_min_clamp():
    """neg/pos < 1 (majority class) must clamp UP to 1.0 (train.py:466)."""
    labels = np.zeros((100, 3), np.float32)
    labels[:80, 0] = 1   # 80% prevalent: raw 20/80 = 0.25 -> 1.0
    labels[:10, 1] = 1   # rare: 90/10 = 9
    # column 2: zero positives -> 1.0 (value moot, positives never fire)
    pw = pos_weight_from_labels(labels, clamp_max=30.0)
    assert pw[0] == 1.0
    assert pw[1] == 9.0
    assert pw[2] == 1.0


def test_build_dataloader_prefetch(rng):
    ds = ChestXRDataset(_records(rng, 8), _tok(), max_length=16, image_size=32)
    dl = build_dataloader(ds, batch_size=4, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 32, 32, 3)


def test_dataloader_workers_match_serial(rng):
    """The thread-pool decode path must yield byte-identical batches in
    the same order as the serial path."""
    recs = _records(rng, 10)
    ds = ChestXRDataset(recs, _tok(), max_length=16, image_size=32)
    serial = list(build_dataloader(ds, batch_size=4, seed=3))
    pooled = list(build_dataloader(ds, batch_size=4, num_workers=4, seed=3))
    assert len(serial) == len(pooled) == 3
    for a, b in zip(serial, pooled):
        assert a["ids"] == b["ids"]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["valid"], b["valid"])


def test_prefetch_loader_delegates_ds_and_epoch(rng):
    """run_joint_training reads loader.ds.records and sets loader._epoch on
    resume; the prefetch wrapper must delegate both to the inner iterator
    (regression: AttributeError with num_workers > 0)."""
    ds = ChestXRDataset(_records(rng, 8), _tok(), max_length=16, image_size=32)
    dl = build_dataloader(ds, batch_size=4, num_workers=2, seed=1)
    assert dl.ds is ds
    dl._epoch = 3
    assert dl.inner._epoch == 3
    # epoch reseed goes through the wrapper: same as inner at _epoch=3
    inner = build_dataloader(ds, batch_size=4, seed=1)
    inner._epoch = 3
    for a, b in zip(dl, inner):
        assert a["ids"] == b["ids"]
