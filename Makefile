# Developer entry points (the check.yml analogue: test gate, slow conformance,
# bench, native build).

.PHONY: lint test test-tpu test-slow fuzz multihost bigscan bench bench-competitors breakeven conformance native clean

lint:
	python scripts/lint.py

test:
	python -m pytest tests/ -x -q -m "not slow"

test-tpu:
	SLICESLICE_TEST_TPU=1 python -m pytest tests/ -q -m "not slow"

test-slow:
	SLICESLICE_TEST_TPU=1 python -m pytest tests/ -q -m slow

fuzz:
	python scripts/fuzz_campaign.py

multihost:
	python scripts/multihost_check.py

bigscan:
	python scripts/bigscan_check.py

bench:
	python bench.py
	python scripts/update_readme_bench.py
	python scripts/make_benchmarks_svg.py

bench-competitors:
	python benchmarks/competitors.py

breakeven:
	python scripts/breakeven.py

conformance:
	python scripts/conformance.py

native:
	python -c "from sliceslice_tpu.utils import native; assert native.available()"

clean:
	rm -rf csrc/build .pytest_cache $(shell find . -name __pycache__)
