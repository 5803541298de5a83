#!/usr/bin/env bash
# Sharded test runner (VERDICT r3 weak #7: the monolithic slow set outgrew a
# 30-minute single-process run on a 1-core CPU box).
#
# Runs the fast set, then the slow set in three separate pytest processes.
# Separate processes matter twice over:
#   * each batch stays < 100 tests, so the conftest keeps persistent-cache
#     WRITES enabled (full-suite runs disable them to dodge a jaxlib 0.9.0
#     serialize segfault) — warm reruns stay fast;
#   * a batch failure is localized instead of killing one long run.
#
# Usage: scripts/run_tests.sh [fast|slow|all(default)]

set -u
cd "$(dirname "$0")/.."
mode="${1:-all}"
rc=0

run() {
  echo "=== $1 ==="
  shift
  python -m pytest -q "$@" || rc=1
}

# like run(), but pytest exit code 5 ("no tests collected") is OK — used for
# the remainder shard, which is EXPECTED to be empty until someone adds a new
# slow test file outside the named shards
run_maybe_empty() {
  echo "=== $1 ==="
  shift
  python -m pytest -q "$@"
  code=$?
  if [ "$code" -ne 0 ] && [ "$code" -ne 5 ]; then rc=1; fi
}

if [ "$mode" = fast ] || [ "$mode" = all ]; then
  run "fast set" -m "not slow" tests/
fi

if [ "$mode" = slow ] || [ "$mode" = all ]; then
  run "slow: e2e workflows" -m slow tests/test_e2e_tiny.py
  run "slow: checkpoint fire drill" -m slow tests/test_fire_drill.py
  # cache WRITES off for this shard: it compiles the most distinct
  # executables (8-device meshes x 3 families), and a code change that
  # invalidates the cache walks one process across jaxlib 0.9.0's
  # ~250-compile executable.serialize() segfault threshold (tests/conftest.py)
  echo "=== slow: distributed + comm + singleton ==="
  UNIVST_TEST_NO_CACHE_WRITES=1 python -m pytest -q -m slow \
    tests/test_distributed.py tests/test_comm_pattern.py \
    tests/test_style_singleton.py || rc=1
  run "slow: models + methods" -m slow \
    tests/test_raft.py tests/test_unet_ad.py tests/test_unet_sd.py \
    tests/test_style_transfer.py tests/test_mmdit.py
  # remainder shard: any slow test not named above (catches new slow files
  # so they cannot silently fall out of the sharded runner)
  run_maybe_empty "slow: remainder" -m slow tests/ \
    --ignore=tests/test_e2e_tiny.py --ignore=tests/test_fire_drill.py \
    --ignore=tests/test_distributed.py --ignore=tests/test_comm_pattern.py \
    --ignore=tests/test_style_singleton.py --ignore=tests/test_raft.py \
    --ignore=tests/test_unet_ad.py --ignore=tests/test_unet_sd.py \
    --ignore=tests/test_style_transfer.py --ignore=tests/test_mmdit.py
fi

exit $rc
