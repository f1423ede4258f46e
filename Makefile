# Developer UX mirroring the reference's Makefile (test / gen-spec targets)
# plus the TPU build's own: native library, bench, examples.

PY ?= python

.PHONY: test test-fast heavy-test native gen-spec examples bench clean install-git-hooks

# --dist loadfile: heavy module-scoped fixtures (proof containers) must not
# be rebuilt once per worker.  Full-size proving suites live behind
# DVT_HEAVY_TESTS (`make heavy-test`); the default path still includes a
# REAL container prove/verify smoke via the numpy host prover
# (tests/test_pipeline_smoke.py — no XLA compile), and AIR-logic STARK
# suites route through the bit-identical host prover (DVT_PROVER=host
# module fixtures) so the default run is not XLA-CPU-compile-bound.
test:
	$(PY) -m pytest tests/ -q -n auto --dist loadfile

test-fast:
	$(PY) -m pytest tests/ -q -n auto --dist loadfile --ignore=tests/test_golden_vectors.py

# full-size proving suites (container fixtures, wide-chip STARKs, CPU-mesh
# distributed proofs, device scalar-mul compiles) — CPU-hours cold
heavy-test:
	DVT_HEAVY_TESTS=1 $(PY) -m pytest tests/ -q -n auto --dist loadfile

native:
	g++ -O3 -shared -fPIC -o native/dvt_native.so native/dvt_native.cpp
	g++ -O3 -shared -fPIC -o native/bls381.so native/bls381.cpp

# regenerate the four schema files (auth variant, like script/gen_spec.sh)
gen-spec:
	mkdir -p spec/json spec/yaml
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=bad-share --schema-type=json -o spec/json/share_exchange_spec.json
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=finalization --schema-type=json -o spec/json/finalization_spec.json
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=bad-partial-key --schema-type=json -o spec/json/bad_partial_key_spec.json
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=bad-encrypted-share --schema-type=json -o spec/json/bad_encrypted_partial_key_spec.json
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=bad-share --schema-type=yaml -o spec/yaml/share_exchange_spec.yaml
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=finalization --schema-type=yaml -o spec/yaml/finalization.yaml
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=bad-partial-key --schema-type=yaml -o spec/yaml/bad_partial_key.yaml
	$(PY) -m dvt_circuits_tpu.cli --auth-commitment get-schema --type=bad-encrypted-share --schema-type=yaml -o spec/yaml/bad_encrypted_partial_key_spec.yaml

examples:
	$(PY) scripts/run_all_examples.py

bench:
	$(PY) bench.py

# mirror of the reference's `make install-git-hooks` (Makefile:15-22)
install-git-hooks:
	cp scripts/hooks/pre-commit .git/hooks/pre-commit
	chmod +x .git/hooks/pre-commit

clean:
	rm -rf native/*.so **/__pycache__ .pytest_cache
