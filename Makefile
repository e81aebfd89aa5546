# Convenience targets (the real build logic lives in native/Makefile and
# pyproject.toml).
.PHONY: all native test bench clean wheel

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

wheel:
	python -m build

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info leaxer_qwen3_tts_tpu/_native
