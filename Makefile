# Local mirror of the CI pipeline (.github/workflows/ci.yml): no Actions
# runner exists in the dev environment, so `make ci` executes the same
# steps the workflow runs — the workflow YAML stays exercised logic.
PY ?= python

.PHONY: ci test coverage-gate native dryrun docs bench clean

ci: native test coverage-gate dryrun

native:
	$(PY) -c "from guidemaker_tpu import native; print('native:', native.available())"

test:
	GUIDEMAKER_COV=1 $(PY) -m pytest tests/ -q --durations=20

coverage-gate:
	$(PY) -c "import json; d=json.load(open('coverage_guidemaker.json')); \
	print(f\"total coverage: {d['total_percent']}% ({d['hit']}/{d['lines']} lines)\"); \
	assert d['total_percent'] >= 90.0, d['total_percent']"

dryrun:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

docs:
	$(PY) tools/gen_api_docs.py

bench:
	$(PY) bench.py

clean:
	rm -rf guidemaker_tpu/native/*.so coverage_guidemaker.json
