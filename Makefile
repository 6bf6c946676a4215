# Developer entry points. The TPU chip is used by `bench` and `smoke`;
# everything else runs on the virtual CPU mesh.

PY := python

.PHONY: test test-fast bench smoke dryrun native eval-smoke clean

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

bench:
	$(PY) bench.py

smoke:
	$(PY) main.py --cfg cfg/debug_tiny.yml

dryrun:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) __graft_entry__.py

# Full offline eval chain on CPU: fixture -> train -> sample ->
# finetune Inception -> IS/FID JSON (VERDICT r1 item 5).
eval-smoke:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PY) scripts/eval_smoke.py

native:
	$(PY) -c "from s2i_tpu import native; assert native.native_available(); print('native loader OK')"

clean:
	rm -rf s2i_tpu/native/build output/ .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
