# Developer entry points (the reference ships a Makefile for build/run
# variants — /root/reference/Makefile; ours covers the equivalent workflows).

PY ?= python

.PHONY: test bench serve serve-fake native sanitize proto clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

serve:
	$(PY) -m speaksense_tpu.main

serve-fake:
	$(PY) -m speaksense_tpu.main --fake-engine

native:
	$(PY) -c "from speaksense_tpu.native.build import build; print(build(force=True))"

sanitize:  # ASAN+UBSAN and TSAN runs of the native kernels (SURVEY §5)
	$(PY) -c "from speaksense_tpu.native.build import build_sanitizer as b; b('address'); b('thread'); print('sanitizers clean')"

proto:
	sh speaksense_tpu/serving/pb/regenerate.sh

clean:
	rm -rf speaksense_tpu/native/*.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
