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

# Each case: (query, [candidates...]) — candidate 0 is the target; top-1
# accuracy is the score. Candidates are reference-README-style sentences.
_CORPUS = [
    "i like animals",
    "i like cars",
    "i like programming",
    "technology is the future",
    "the stock market fell sharply",
    "my favorite food is pasta",
    "she plays the violin beautifully",
]


def _cases(queries_and_targets):
    return [
        (q, [_CORPUS[t]] + [c for i, c in enumerate(_CORPUS) if i != t])
        for q, t in queries_and_targets
    ]


IN_DOMAIN = {
    # the reference's own semantic assertion (test_vector_database.py:195+)
    "dogs_to_animals": _cases([("i like dogs", 0)]),
    # held-out templates over trained concept groups
    "synonym_templates": _cases([
        ("my favorite thing is a puppy", 0),
        ("nothing beats a good truck", 1),
        ("i spend evenings coding", 2),
        ("computers keep getting better", 3),
        ("i love eating spaghetti", 5),
    ]),
    # the six trained languages (es/fr/de/it/pt + en above)
    "trained_languages": _cases([
        ("me gustan los perros", 0),
        ("j'aime les chiens", 0),
        ("ich mag hunde", 0),
        ("mi piacciono i cani", 0),
        ("eu gosto de cachorros", 0),
    ]),
}

STRESSORS = {
    # domain jargon sharing no content word with any corpus sentence
    "oov_jargon": _cases([
        ("the kubernetes deployment rolled back", 3),
        ("my golden retriever chased a squirrel", 0),
        ("the sedan needs new brake pads", 1),
        ("debugging the segfault took all night", 2),
        ("the hedge fund liquidated its positions", 4),
        ("simmer the marinara with fresh basil", 5),
        ("the cellist tuned before the concerto", 6),
    ]),
    # languages the bundled corpus never saw
    "unseen_languages": _cases([
        ("ik hou van honden", 0),          # nl
        ("lubie psy", 0),                  # pl
        ("jag gillar hundar", 0),          # sv
        ("inu ga daisuki desu", 0),        # ja (romaji)
    ]),
    # paraphrases with zero lexical overlap with their target
    "paraphrase": _cases([
        ("canines are wonderful creatures", 0),
        ("automobiles fascinate me", 1),
        ("writing software brings me joy", 2),
        ("machines will shape tomorrow", 3),
        ("equities plunged at the closing bell", 4),
        ("noodles in tomato sauce are delicious", 5),
    ]),
}

_SLOTS = ("builtin", "small", "large", "bgem3")


def _score(model, cases) -> float:
    hits = 0
    for q, cands in cases:
        emb = np.asarray(model.extract_embeddings_batch([q] + cands))
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        hits += int(np.argmax(emb[1:] @ emb[0]) == 0)
    return hits / len(cases)


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

    report: dict = {"slots": {}}
    for slot in _SLOTS:
        print(f"probing {slot}...", flush=True)
        report["slots"][slot] = _probe_slot(slot)
        print(f"  {json.dumps(report['slots'][slot])}", flush=True)

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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
