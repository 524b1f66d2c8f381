# vimz-tpu Makefile — run/benchmark targets (reference: vimz/Makefile:1-120
# and the root Makefile's input-data generation, Makefile:21-32).
#
# Usage:
#   make <transformation>           prove one transformation (DEMO=1 for 10 steps)
#   make input-data SOURCE=img.png  generate witness JSONs for all transformations
#   make benchmark                  parallel multi-transform benchmark
#   make test                       fast test suite
#   make analyze-circuits           constraint-count table vs reference

TRANSFORMATIONS := blur brightness contrast crop grayscale redact resize sharpness
PY := python
SOURCE ?= source_image/HD.png
INPUT_DIR ?= input_data
DEMO ?=
COMPRESS ?=
DEVICE ?= default

DEMO_FLAG := $(if $(DEMO),--demo,)
COMPRESS_FLAG := $(if $(COMPRESS),--compress,)

.PHONY: all test test-all test-inprocess analyze-circuits comparison benchmark \
        check-env input-data source-images verifier-contracts solidity-check \
        $(TRANSFORMATIONS)

all: test

# Default gate: per-file subprocesses — the only mode that reliably survives
# this jaxlib's fresh-compile segfaults (see scripts/run_tests.py).
test:
	$(PY) scripts/run_tests.py -m "not slow"

test-all:
	$(PY) scripts/run_tests.py

# One-process run (historical; known to segfault in jaxlib on cold caches)
test-inprocess:
	$(PY) -m pytest tests/ -x -q -m "not slow"

analyze-circuits:
	$(PY) -m vimz_tpu.tools.analyze_circuits

comparison:
	$(PY) -m vimz_tpu.tools.comparison -f grayscale contrast --steps 8

check-env:
	$(PY) scripts/check_env.py

source_image/HD.png:
	$(PY) scripts/make_source_images.py source_image

source-images: source_image/HD.png

input-data: $(SOURCE)
	mkdir -p $(INPUT_DIR)
	for t in grayscale brightness contrast blur sharpness crop resize redact hash; do \
	  case $$t in \
	    brightness|contrast) extra="--factor 1.4" ;; \
	    crop) extra="--x 200 --y 100 --crop-size SD" ;; \
	    resize) extra="--resize-option 'HD to SD'" ;; \
	    *) extra="" ;; \
	  esac; \
	  $(PY) -m vimz_tpu.editor.cli $$t -i $(SOURCE) -o $(INPUT_DIR) $$extra || exit 1; \
	done

$(TRANSFORMATIONS):
	$(PY) -m vimz_tpu.cli -i $(INPUT_DIR)/$@.json -f $@ $(DEMO_FLAG) $(COMPRESS_FLAG) \
	  --device $(DEVICE) -o $(INPUT_DIR)/$@.proof.json

benchmark:
	$(PY) scripts/benchmark.py

verifier-contracts:
	$(PY) -m vimz_tpu.tools.generate_verifier_contract -o contracts/generated

# Structural Solidity gate (no solc in this image; see the script docstring
# for what it does and does not catch). Also covers contracts/generated.
solidity-check:
	$(PY) scripts/solidity_check.py
