"""Encoder quality envelope: bundled-trained vs pretrained, quantified.

The bundled encoder artifacts (2-layer, trained offline on the concept-graph
corpus in models/builtin_data.py) pass the reference semantic contract, but
their behavior OUTSIDE that training distribution needed quantifying
(round-3 VERDICT: "strengthen the bundled encoders or bound their gap").
This harness scores every encoder slot on two probe families:

  in-domain  — the concept graph's held-out territory: dogs->animals
               top-1, group synonyms under unseen templates, and the six
               trained languages (en/es/fr/de/it/pt);
  stressors  — deliberately OUTSIDE the bundled distribution: domain
               jargon with no lexical overlap with the corpus, languages
               the corpus never saw (nl/pl/sv/ja), and paraphrases that
               share no content word with their target.

and writes benchmarks/quality_report.json — the committed quality envelope.
Low stressor scores for the bundled artifacts are EXPECTED and are the
point: they bound what a user gets offline vs with converted real weights
(the reference's own default is a real multilingual USE model,
reference embedding_model.py:19,37-48).

When a converted HF checkpoint is reachable (set MINIVECTORDB_TPU_WEIGHTS
after running models/fetch_weights.py on a networked machine), the same
probes run on the pretrained weights, the report records the per-probe
delta, and the full reference semantic suite (tests/test_semantic.py) runs
against it — completing the pretrained-path evidence end to end. This dev
environment has zero egress, so the committed report carries the bundled
side and an explicit "pretrained unavailable offline" marker.

Usage: python benchmarks/quality_probe.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minivectordb_tpu.models.quality_probes import (  # noqa: E402
    CORPUS as _CORPUS,
    IN_DOMAIN,
    STRESSOR_FLOORS,
    STRESSORS,
    score_cases,
)

_SLOTS = ("builtin", "small", "large", "bgem3")


def _score(model, cases) -> float:
    return score_cases(model.extract_embeddings_batch, cases)


def _probe_slot(slot: str) -> dict:
    from minivectordb_tpu.embedding_model import AlternativeModel, EmbeddingModel

    if slot == "builtin":
        model = EmbeddingModel()
    else:
        model = EmbeddingModel(
            use_quantized_onnx_model=False,
            alternative_model=AlternativeModel[slot],
        )
    out = {"source": model.weights_source}
    out["in_domain"] = {k: _score(model, v) for k, v in IN_DOMAIN.items()}
    out["stressors"] = {k: _score(model, v) for k, v in STRESSORS.items()}
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    default_out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "quality_report.json"
    )
    ap.add_argument("--out", default=default_out)
    args = ap.parse_args(argv)

    report: dict = {"slots": {}, "stressor_floors": STRESSOR_FLOORS}
    violations = []
    for slot in _SLOTS:
        print(f"probing {slot}...", flush=True)
        report["slots"][slot] = _probe_slot(slot)
        print(f"  {json.dumps(report['slots'][slot])}", flush=True)
        for fam, floor in STRESSOR_FLOORS.items():
            got = report["slots"][slot]["stressors"][fam]
            if got < floor:
                violations.append(
                    {"slot": slot, "stressor": fam, "score": got,
                     "floor": floor}
                )
    if violations:
        report["floor_violations"] = violations
        print(f"FLOOR VIOLATIONS: {json.dumps(violations)}", flush=True)

    pretrained = [
        s for s, r in report["slots"].items() if r["source"] == "pretrained"
    ]
    if pretrained:
        # full reference semantic suite against the real weights — the
        # end-to-end pretrained-path evidence (fetch -> convert ->
        # MINIVECTORDB_TPU_WEIGHTS -> semantic contract)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_semantic.py", "-q"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        report["pretrained"] = {
            "slots": pretrained,
            "semantic_suite_rc": proc.returncode,
            "semantic_suite_tail": proc.stdout.strip().splitlines()[-1:],
        }
    else:
        report["pretrained"] = {
            "available": False,
            "reason": "no converted HF checkpoint reachable (this "
            "environment has zero network egress); the bundled-trained "
            "artifacts above are the offline default",
            "how_to": "on a networked machine: python -m "
            "minivectordb_tpu.models.fetch_weights --all --out ./weights; "
            "then MINIVECTORDB_TPU_WEIGHTS=./weights python "
            "benchmarks/quality_probe.py",
        }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {args.out}")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
