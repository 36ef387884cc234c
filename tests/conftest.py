"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The multi-chip sharding paths are exercised in tests on virtual CPU devices
(there is at most one real TPU chip available in CI); benchmarking against
the real chip happens in bench.py, not here.
"""

import os
from pathlib import Path

# PYANI_TPU_TEST_REAL=1 keeps the real accelerator backend so the
# compiled-mode (non-interpret) tests in test_tpu_compiled.py can run
# against the actual chip: PYANI_TPU_TEST_REAL=1 pytest
# tests/test_tpu_compiled.py. Everything else runs on the virtual
# 8-device CPU mesh.
if os.environ.get("PYANI_TPU_TEST_REAL") != "1":
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The environment pins JAX_PLATFORMS=axon (real TPU via tunnel) at
    # interpreter startup, so an env var is not enough -- force the host
    # platform through the config API before any backend initialisation.
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - jax missing or initialised
        pass

import pytest

REFERENCE_FIXTURES = Path("/root/reference/tests/fixtures")


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    """Reference repo golden fixture directory (read-only)."""
    if not REFERENCE_FIXTURES.is_dir():
        pytest.skip("reference fixtures not available")
    return REFERENCE_FIXTURES


@pytest.fixture(scope="session")
def viral_example(fixtures_dir: Path) -> Path:
    """Three ~39-58kb phage genomes: the main golden set."""
    return fixtures_dir / "viral_example"


@pytest.fixture(scope="session")
def bacterial_example(fixtures_dir: Path) -> Path:
    """Four gzipped bacterial genomes (fast methods only)."""
    return fixtures_dir / "bacterial_example"


@pytest.fixture(scope="session")
def bad_alignments(fixtures_dir: Path) -> Path:
    """Two divergent phages with no alignable regions (all-NULL)."""
    return fixtures_dir / "bad_alignments"
