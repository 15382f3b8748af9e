.PHONY: check-fast test bench install-hooks

# Pure-Python guardrails (~2 s, no Spark): registry/COVERAGE.md sync
# and the driver 50-name lexical-window invariant. Run before EVERY
# commit that touches registry.py, COVERAGE.md, or adds a query —
# round 6's snapshot commit skipped these and shipped 2 red tests.
# A test rename breaks this target loudly (pinned node id) — that is
# deliberate; fix the pin rather than dropping the guard.
check-fast:
	python -m pytest tests/test_coverage_sync.py tests/test_coverage_index.py \
	  "tests/test_properties.py::test_driver_window_holds_exactly_50_unprefixed_names" \
	  -q

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# One-command re-install of the versioned git hooks after a fresh
# clone (hooks in .git/ don't travel with the repo).
install-hooks:
	git config core.hooksPath scripts/hooks
