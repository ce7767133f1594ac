"""Round-5 VERDICT item 6: the bundled encoder artifacts must clear the OOD
stressor floors — a retrain that regresses them fails CI instead of landing
silently (the same contract the recall floors give the scan)."""

import pytest

from minivectordb_tpu.models.quality_probes import (
    IN_DOMAIN,
    STRESSOR_FLOORS,
    STRESSORS,
    score_cases,
)
from minivectordb_tpu.embedding_model import AlternativeModel, EmbeddingModel


def _score(model, cases):
    return score_cases(model.extract_embeddings_batch, cases)

_SLOTS = ("builtin", "small", "large", "bgem3")


def _model(slot):
    if slot == "builtin":
        return EmbeddingModel()
    return EmbeddingModel(
        use_quantized_onnx_model=False, alternative_model=AlternativeModel[slot]
    )


@pytest.mark.parametrize("slot", _SLOTS)
def test_stressor_floors(slot):
    m = _model(slot)
    for fam, floor in STRESSOR_FLOORS.items():
        score = _score(m, STRESSORS[fam])
        assert score >= floor, (
            f"{slot}.{fam} = {score:.3f} below floor {floor} — the bundled "
            f"artifact regressed; retrain (python -m "
            f"minivectordb_tpu.models.train_builtin --slot {slot})"
        )


@pytest.mark.parametrize("slot", _SLOTS)
def test_in_domain_probes(slot):
    m = _model(slot)
    assert _score(m, IN_DOMAIN["dogs_to_animals"]) == 1.0
    assert _score(m, IN_DOMAIN["trained_languages"]) >= 0.8
