"""Round-5 VERDICT item 3: every benchmark number quoted in the docs must
exist verbatim in a committed artifact. Docs register their quotes in
benchmarks/cited.json; this test fails when a doc quote and its artifact
value drift apart (the round-4 failure mode: a re-run overwrote
full_report.json and STATUS.md kept citing the vanished numbers).

Each citation entry:
  {"doc": "STATUS.md",                  # repo-relative doc file
   "artifact": "benchmarks/full_report.json",
   "path": "config2_filters_mutations.delete_s",  # dotted JSON path
   "text": "0.0002 s/delete"}           # substring that must appear in doc

The first number inside ``text`` is compared against the artifact value at
``path`` to the precision the text printed.
"""

import json
import math
import os
import re

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CITED = os.path.join(_ROOT, "benchmarks", "cited.json")

_NUM = re.compile(r"-?\d+(?:,\d{3})*(?:\.\d+)?(?:e-?\d+)?")


def _load():
    if not os.path.exists(_CITED):
        return []
    with open(_CITED) as f:
        return json.load(f)["citations"]


def _resolve(obj, dotted):
    for part in dotted.split("."):
        if isinstance(obj, list):
            obj = obj[int(part)]
        else:
            obj = obj[part]
    return obj


@pytest.mark.parametrize(
    "cit", _load(), ids=lambda c: f"{c['doc']}:{c['path']}"
)
def test_citation(cit):
    doc_path = os.path.join(_ROOT, cit["doc"])
    with open(doc_path) as f:
        doc = f.read()
    assert cit["text"] in doc, (
        f"{cit['doc']} no longer contains the registered quote "
        f"{cit['text']!r} — update benchmarks/cited.json together with the doc"
    )
    m = _NUM.search(cit["text"])
    assert m, f"citation text {cit['text']!r} contains no number"
    quoted = float(m.group(0).replace(",", ""))
    with open(os.path.join(_ROOT, cit["artifact"])) as f:
        value = float(_resolve(json.load(f), cit["path"]))
    # match to the precision the text printed: tolerance = 1 unit in the
    # last shown SIGNIFICANT digit (leading zeros in "0.000091" are place
    # holders, not precision; exponents are not digits)
    mantissa = m.group(0).split("e")[0].split("E")[0]
    digits = len(
        mantissa.replace(",", "").replace("-", "")
        .replace(".", "").lstrip("0")
    ) or 1
    if quoted == 0:
        tol = 1e-9
    else:
        tol = abs(quoted) * 10 ** (-(digits - 1)) * 0.51 + 1e-12
    assert math.isclose(quoted, value, abs_tol=tol), (
        f"{cit['doc']} quotes {quoted} for {cit['artifact']}:{cit['path']} "
        f"but the committed artifact holds {value}"
    )


def test_citations_file_is_wellformed():
    for cit in _load():
        assert set(cit) >= {"doc", "artifact", "path", "text"}, cit
