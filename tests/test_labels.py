from mmrp_tpu.labels import LABEL_COLS, NUM_CLASSES, get_taxonomy


def test_43_classes():
    assert NUM_CLASSES == 43
    assert len(LABEL_COLS) == 43
    assert len(set(LABEL_COLS)) == 43


def test_category_counts():
    tax = get_taxonomy()
    # reference: 19 disease + 1 normal + 19 finding + 4 symptom groups
    assert len(tax.groups_in("disease")) == 19
    assert len(tax.groups_in("normal")) == 1
    assert len(tax.groups_in("finding")) == 19
    assert len(tax.groups_in("symptom")) == 4


def test_canonical_order_is_category_blocks():
    tax = get_taxonomy()
    cols = tax.label_cols
    d, n, f, s = (len(tax.groups_in(c)) for c in ("disease", "normal", "finding", "symptom"))
    assert cols[:d] == tax.groups_in("disease")
    assert cols[d : d + n] == tax.groups_in("normal")
    assert cols[d + n : d + n + f] == tax.groups_in("finding")
    assert cols[d + n + f :] == tax.groups_in("symptom")


def test_known_groups_present():
    tax = get_taxonomy()
    combined = tax.combined_groups()
    assert "atelectasis" in combined
    assert "cardiac" in combined
    assert "Normal" in combined
    assert "pneumonia" in combined["infection_pneumonia"]
    assert "cardiomegaly" in combined["cardiac"]
    assert "normal" in combined["Normal"]


def test_auxiliary_categories_not_in_label_space():
    tax = get_taxonomy()
    assert "anatomy" in tax.categories
    for g in tax.groups_in("anatomy"):
        assert g not in LABEL_COLS
