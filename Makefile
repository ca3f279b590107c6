# Developer entry points (analogue of the reference's Makefile lint target).

lint:
	@echo "    Linting thetis_tpu codebase"
	@python scripts/lint.py thetis_tpu
	@echo "    Linting test suite"
	@python scripts/lint.py tests
	@echo "    Linting examples"
	@python scripts/lint.py examples
	@echo "    Linting demos"
	@python scripts/lint.py demos

test:
	python -m pytest tests/ -q

test-slow:
	python -m pytest tests/ -q -m slow

test-all:
	python -m pytest tests/ -q -m ""

native:
	g++ -O2 -shared -fPIC -o thetis_tpu/native/libmeshbuild.so \
	    thetis_tpu/native/meshbuild.cpp

.PHONY: lint test test-slow test-all native
