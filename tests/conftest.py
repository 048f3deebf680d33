"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests run on CPU so they are hermetic and fast; multi-chip sharding tests use
the 8 virtual devices. Real-TPU execution is exercised by bench.py and the
driver's __graft_entry__ checks.
"""

import os

# The container's sitecustomize pre-imports jax and pins jax_platforms to
# "axon,cpu" (tunneled TPU). Point XLA_FLAGS at 8 virtual CPU devices and then
# force the platform back to cpu via jax.config — env vars alone are too late.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def _ensure_native_built() -> None:
    """Build the in-repo C++ extensions once if they aren't importable.

    The 10 native-path tests (data loader + OSOD matcher) otherwise skip
    silently on a fresh checkout — a clean local run must exercise the
    in-repo C++, not just CI. One `build_ext --inplace` costs ~10 s and is
    skipped entirely when the modules already import."""
    import importlib.util
    import subprocess
    import sys
    from pathlib import Path

    missing = [
        m for m in ("runia_core_tpu._native", "runia_core_tpu._native_osod")
        if importlib.util.find_spec(m) is None
    ]
    if not missing:
        return
    repo = Path(__file__).resolve().parent.parent
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=repo, check=True, capture_output=True, timeout=300,
        )
    except Exception as exc:  # no compiler / sandbox: tests then skip as before
        print(f"conftest: native extension build failed ({exc}); "
              "native-path tests will skip", file=sys.stderr)


_ensure_native_built()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled XLA CPU executables at every module boundary.

    The suite compiles ~1,000 programs across its modules; XLA's CPU JIT
    keeps every live executable's code resident, and past a threshold the
    NEXT compile segfaults inside backend_compile (observed three times at
    different late-suite tests, each time at the first fresh compile after
    ~500 accumulated tests; the same compiles succeed in fresh processes).
    Clearing per module caps the live set at one module's worth. Shared
    program-cache wrappers (llm.continuous / llm.generate) stay valid —
    their next call simply recompiles."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.RandomState(1)
