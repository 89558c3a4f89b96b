#!/bin/bash
# Reproducible full-suite run (CPU).
#
# The XLA CPU backend intermittently segfaults at COMPILE time when one
# pytest process compiles many hundreds of programs (observed in
# round 4: SIGSEGV mid-run in arbitrary files, e.g. test_training.py;
# reruns of the same file pass). This is an upstream jaxlib crash, not
# repo state: to make a clean full-suite pass reproducible this harness
# runs each test FILE in its own interpreter and retries a file up to
# RETRIES times iff the process died on a signal (rc >= 128), never on
# an ordinary test failure.
#
# Usage: tools/run_suite.sh [pytest-args...]
# Exit 0 iff every file passed (retries allowed only for signal deaths).

set -u
cd "$(dirname "$0")/.."
RETRIES=${RETRIES:-2}
FAILED=()
for f in tests/test_*.py; do
  ok=0
  for attempt in $(seq 0 "$RETRIES"); do
    python -m pytest "$f" -q "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      ok=1
      break
    elif [ "$rc" -lt 128 ]; then
      # Real test failure: do not retry.
      break
    fi
    echo "[run_suite] $f died on signal (rc=$rc), retry $((attempt + 1))/$RETRIES" >&2
  done
  if [ "$ok" -ne 1 ]; then
    FAILED+=("$f (rc=$rc)")
  fi
done
if [ "${#FAILED[@]}" -ne 0 ]; then
  echo "[run_suite] FAILED: ${FAILED[*]}" >&2
  exit 1
fi
echo "[run_suite] all files passed"
