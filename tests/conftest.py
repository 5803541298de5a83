"""Test env: force CPU backend with 8 virtual devices for mesh tests.

Must run before any jax import — the standard JAX idiom for testing
pjit/shard_map without TPU hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Full fp32 matmuls for strict numeric parity tests (the default truncates
# fp32 matmul inputs to bf16 — the right call on the MXU hot path, wrong for
# golden tests).
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _strict_matmul_precision():
    """Belt-and-braces: enforce the precision even if jax was imported first."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    yield
