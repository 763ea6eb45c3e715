# axtrack_tpu developer entry points
.PHONY: test bench bench-train bench-nms example deploy-model dryrun native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-train:
	python scripts/bench_train.py

bench-nms:
	python scripts/bench_nms.py

example:
	python examples/run_example.py

deploy-model:
	python scripts/make_deployed_model.py --epochs 100 --device cpu

dryrun:
	JAX_PLATFORMS= XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
		axtrack_tpu/native/astar.cpp axtrack_tpu/native/mcf.cpp \
		-o axtrack_tpu/native/libaxtpu_native.so

clean:
	rm -rf axtrack_tpu/native/*.so **/__pycache__ .jax_cache examples/output
