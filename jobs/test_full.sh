#!/usr/bin/env bash
# FULL offline test suite — every test, including the slow fresh-process
# compile / parity-regime subset that the quick gate (pytest.ini addopts
# `-m quick`) deselects.
#
# The default `python -m pytest tests/ -x -q` is the gate-sized CI subset;
# this is the ONE command a CI box runs for complete coverage (tens of
# minutes of XLA compiles on a cold /tmp/jax_cache, a few minutes warm).
#
#   jobs/test_full.sh             # whole suite
#   jobs/test_full.sh -k infer    # extra pytest args pass through
#
# Sharding recipe for parallel CI boxes (N-way by file):
#   jobs/test_full.sh --collect-only -q | ...  or simply split tests/*.py
#   across workers; every file is independent (conftest builds the same
#   virtual 8-device CPU mesh per process).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "" "$@"
