"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding logic is exercised on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring how the
driver dry-runs the multi-chip path.  float64 is enabled so numeric
ground-truth checks can run at full precision; library code is
dtype-polymorphic and runs float32 on real TPUs.
"""

import os

# NO persistent compilation cache for the suite: in this environment the
# accelerator plugin taints XLA:CPU compile target features (observed
# "+prefer-no-gather ... not supported on the host machine" when
# reloading entries written by sibling processes), and cache-loaded
# executables measurably differ numerically from freshly compiled ones —
# bitwise-equality tests (frozen-group checks, cross-process cost
# comparisons) then fail.  Must be set before the package import reads it.
os.environ["CCTPU_JAX_CACHE"] = "0"

import jax

# The environment's sitecustomize registers the TPU ('axon') platform at
# interpreter startup; override to CPU before any backend is initialized.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Schedule the longest-running tests first.

    With xdist worksteal the wall clock is bounded by whichever worker
    ends last; the ~12-min on-chip kernel test and the multi-minute
    noncentral/E2E chains must START early or they extend the tail.
    Ordering is a scheduling hint only — no test depends on order.
    """
    front_modules = (
        "test_tpu_kernels",  # ~12 min on the real chip (subprocess)
        "test_noncentral_init",  # 3 module-fixture params, ~2 min each
        "test_image_input",  # record-CLI subprocess recompile
        "test_stress_e2e",
        "test_e2e",
    )

    def rank(item):
        for i, m in enumerate(front_modules):
            if m in item.nodeid:
                return i
        return len(front_modules)

    items.sort(key=rank)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite accumulates ~100 XLA:CPU executables; at that volume
    the jax-0.9.0 CPU backend_compile intermittently aborts (glibc
    abort inside compilation, reproducible only with the accumulated
    state — every subset of the suite passes).  Clearing the compilation
    caches per module bounds the accumulation and costs only the
    cross-module recompiles (modules share few jitted functions).
    """
    jax.clear_caches()
    yield
