.PHONY: all native test test-tpu test-fast bench compat tables clean

all: native

native:
	python -m mp3rgain_tpu._native.build --force

test: native
	python -m pytest tests/ -q

# Same suite against the real TPU chip (bounds auto-scale for bf16x3).
test-tpu: native
	MP3RGAIN_TPU_TESTS=1 python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -k "not stress and not fuzz"

bench: native
	python bench.py

# Precompile the scan pipelines for the common shape ladder (populates
# jax's persistent compilation cache on stacks with stable cache keys).
warmup: native
	python tools/warmup.py

compat: native
	bash scripts/compatibility-test.sh

# Regenerate the format-constant tables from the system codec libraries.
tables:
	python tools/extract_huff_tables.py
	python tools/extract_synth_window.py
	python tools/extract_aac_tables.py

clean:
	rm -f mp3rgain_tpu/_native/libmp3rgain_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
