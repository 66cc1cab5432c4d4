# Convenience targets (reference Makefile analog).

.PHONY: test test-fast bench native examples clean format

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not hf_ and not resnet18_parity"

bench:
	python bench.py

native:
	python -c "from infinitensor_tpu.native import native_available; \
	           assert native_available(); print('native planner OK')"

examples:
	python examples/resnet_onnx_inference.py
	python examples/llama_serving.py

dryrun:
	python __graft_entry__.py 8

clean:
	rm -rf native/*.so **/__pycache__ .pytest_cache
