from mmrp_tpu.data.labeler import PhraseLabeler, tokenize_words, split_sentences
from mmrp_tpu.labels import LABEL_COLS


def test_tokenize_words():
    assert tokenize_words("No acute, cardio-pulmonary disease.") == [
        "no", "acute", "cardio-pulmonary", "disease",
    ]


def test_simple_positive_match():
    lab = PhraseLabeler()
    labels = lab.label_report("Findings consistent with cardiomegaly.")
    assert labels["cardiac"] == 1


def test_multiword_phrase():
    lab = PhraseLabeler()
    labels = lab.label_report("There is a small right pleural effusion.")
    assert labels["pleural_findings"] == 1


def test_negation_suppresses_label():
    lab = PhraseLabeler()
    labels = lab.label_report("No pneumothorax. Heart size is normal.")
    assert labels["air_leak"] == 0
    # "normal" (Normal group phrase) still fires — it is not negated
    assert labels["Normal"] == 1


def test_negation_scopes_to_sentence():
    lab = PhraseLabeler()
    # negation in first sentence must not leak into the second
    labels = lab.label_report("No pleural effusion. There is cardiomegaly.")
    assert labels["pleural_findings"] == 0
    assert labels["cardiac"] == 1


def test_negation_terminated_by_conjunction():
    lab = PhraseLabeler()
    labels = lab.label_report("No effusion but atelectasis is present")
    assert labels["pleural_findings"] == 0
    assert labels["atelectasis"] == 1


def test_no_evidence_of_trigger():
    lab = PhraseLabeler()
    labels = lab.label_report("No evidence of pneumonia or consolidation.")
    assert labels["infection_pneumonia"] == 0
    assert labels["infection_related"] == 0


def test_label_vector_order():
    lab = PhraseLabeler()
    vec = lab.label_vector("cardiomegaly with pleural effusion")
    assert len(vec) == 43
    assert vec[LABEL_COLS.index("cardiac")] == 1
    assert vec[LABEL_COLS.index("pleural_findings")] == 1
    assert sum(vec) == 2


def test_matches_report_positions():
    lab = PhraseLabeler()
    ms = lab.matches("no focal atelectasis; stable cardiomegaly")
    by_group = {m.group: m for m in ms}
    assert by_group["atelectasis"].negated is True
    assert by_group["cardiac"].negated is False
    # longest-match: "focal atelectasis" beats "atelectasis"
    assert by_group["atelectasis"].phrase == "focal atelectasis"


def test_split_sentences():
    assert len(split_sentences("a. b; c: d")) == 4
