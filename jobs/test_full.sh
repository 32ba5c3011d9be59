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
#
# A green FULL run (no -k/-m narrowing) writes tests/.full_suite_stamp.json
# (date + commit + pass count); the quick gate's header prints it and warns
# when it goes stale — the round-4 full run caught 2 tests the quick gate
# missed, so freshness of this run is itself a monitored signal.
set -uo pipefail
cd "$(dirname "$0")/.." || exit 1
out=$(mktemp)
python -m pytest tests/ -q -m "" "$@" 2>&1 | tee "$out"
rc=${PIPESTATUS[0]}
if [ "$rc" -eq 0 ] && [ "$#" -eq 0 ]; then
  passed=$(grep -oE '[0-9]+ passed' "$out" | tail -1 | grep -oE '[0-9]+')
  python - "$passed" <<'EOF'
import json, subprocess, sys, datetime
commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
json.dump({"date": datetime.date.today().isoformat(),
           "commit": commit or "unknown",
           "passed": int(sys.argv[1] or 0)},
          open("tests/.full_suite_stamp.json", "w"), indent=1)
EOF
  echo "full-suite stamp written (tests/.full_suite_stamp.json)"
fi
rm -f "$out"
exit "$rc"
