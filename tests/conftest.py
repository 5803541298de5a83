"""Test env: force a REAL CPU backend with 8 virtual devices for mesh tests.

The machine's sitecustomize pins ``jax_platforms='axon,cpu'`` (the remote TPU
tunnel), and the JAX_PLATFORMS env var does NOT override it — every eager op
would round-trip the network. ``jax.config.update`` does override it; the XLA
host-device flag must still be in the environment before backend init.
This is the standard JAX idiom for testing pjit/shard_map without hardware
(SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Full fp32 matmuls for strict numeric parity tests (the session default
# truncates fp32 matmul inputs to bf16 — right on the MXU, wrong for goldens).
jax.config.update("jax_default_matmul_precision", "highest")
# Whole-graph compiles on the 1-core CPU runner are expensive; cache them.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    """Full-suite runs read the persistent cache but skip WRITES.

    jaxlib 0.9.0's CPU ``executable.serialize()`` segfaults after ~250
    compilations in a single process (reproduced twice at ~95% of the full
    suite, including on a freshly wiped cache; every module passes — and
    serializes the same executables — when run on its own). Subset runs
    (< 100 tests) keep populating the cache, so iterative development stays
    warm; the full suite trades cache writes for surviving one process.

    ``UNIVST_TEST_NO_CACHE_WRITES=1`` forces writes off regardless of batch
    size: a sub-100-test shard can still cross the ~250-compile serialize
    threshold when a code change invalidates many cached executables at once
    (observed on the distributed shard after the round-5 attention-layout
    change — segfault in put_executable_and_time mid-shard).
    """
    import os
    import sys

    if len(items) > 100 or os.environ.get("UNIVST_TEST_NO_CACHE_WRITES"):
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
        print("[conftest] persistent-cache writes disabled "
              f"({len(items)} tests collected)", file=sys.stderr)
