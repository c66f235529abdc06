"""Global numerical configuration.

Camera calibration needs full float32 matmul accuracy: on TPU, JAX's
default matmul precision routes f32 contractions through bf16 MXU passes,
which costs ~3 decimal digits — measured to turn a float32 DLT homography
from ~1e-5 px reprojection error into ~0.15 px.  Sub-0.1 px calibration is
the whole point of this framework, so the package sets the global default
matmul precision to ``highest`` at import.  This also fixes the internals
of ``jnp.linalg`` (eigh/svd/solve), which cannot be controlled per call.

Individual hot kernels that genuinely tolerate bf16 (e.g. visualization,
big Schur GEMMs after scaling) opt down explicitly via the ``precision=``
argument, which overrides the global default.

Set the environment variable ``CCTPU_NO_PRECISION_OVERRIDE=1`` before
import to leave JAX's default untouched.
"""

from __future__ import annotations

import os

import jax


def configure_precision() -> None:
    if os.environ.get("CCTPU_NO_PRECISION_OVERRIDE") != "1":
        jax.config.update("jax_default_matmul_precision", "highest")


def configure_platforms() -> None:
    """Restore JAX_PLATFORMS semantics under plugin sitecustomizes.

    On hosts whose interpreter startup registers an accelerator plugin
    and pins ``jax_platforms`` itself, the JAX_PLATFORMS environment
    variable set by a *parent process* is silently ignored — observed
    here: ``JAX_PLATFORMS=cpu python -c "import jax; jax.devices()"``
    still initialized (and, with the accelerator tunnel down, hung on)
    the plugin backend, while the config-flag route worked.  Pushing the
    env value into the config flag before first backend use makes the
    documented env contract hold for every consumer of this package
    (subprocess tests rely on it).  A no-op when the env var is unset or
    already matches.
    """
    p = os.environ.get("JAX_PLATFORMS")
    if not p:
        return
    cur = (jax.config.jax_platforms or "")
    cur_first = cur.split(",")[0].strip() if cur else ""
    # A process that already pinned the CPU platform first (the test
    # conftest, virtual-mesh dryruns) made an explicit in-process choice
    # AFTER the plugin boot; a machine-wide JAX_PLATFORMS value must not
    # override it.  Everything else is the plugin's own pin, where the
    # env contract should hold.
    if cur_first == "cpu":
        return
    # Keep a CPU backend available at lowest priority: the host phases
    # (f64 polish, CPU-pinned init/fit solves) require
    # jax.local_devices(backend="cpu"), and an accelerator-only platform
    # pin (e.g. JAX_PLATFORMS=axon set machine-wide) would silently drop
    # them to degraded paths.  The default backend is still the first
    # platform named by the env var.
    platforms = [s.strip() for s in p.split(",") if s.strip()]
    if "cpu" not in platforms:
        platforms.append("cpu")
    joined = ",".join(platforms)
    if joined == cur:
        return
    try:
        jax.config.update("jax_platforms", joined)
    except Exception:  # backends already initialized — too late
        pass


def configure_compilation_cache(entry_point: bool = False) -> None:
    """Persistent XLA compilation cache (explicit opt-in).

    A calibration run compiles one LM-step executable per grid
    resolution (the pyramid changes shape each level); on a remote TPU
    runtime each compile costs 30-60 s, which dominates the measured
    end-to-end wall clock (~150 s of a 365 s pipeline).  The disk cache
    makes every run after the first skip them — the analog of the
    reference being a compiled binary.

    The cache is NOT enabled as an import-time side effect: on this
    stack, cache entries written by a TPU-plugin process taint the
    recorded XLA:CPU target features, and cache-loaded executables were
    observed to differ numerically from fresh compiles when shared
    across backends — a silent-wrong-numerics hazard for library
    consumers running multi-process pipelines.  Therefore:

    - our own entry points (CLI, benchmarks) call this with
      ``entry_point=True``;
    - library users opt in with ``CCTPU_JAX_CACHE=1`` (or ``=/path``)
      before import, or by calling this function themselves;
    - ``CCTPU_JAX_CACHE=0`` disables it everywhere;
    - the cache directory is keyed by the runtime platform
      (``.../jax_cache-<platform>``) so CPU and TPU-plugin processes
      never share entries.
    """
    setting = os.environ.get("CCTPU_JAX_CACHE", "")
    if setting == "0" or (not entry_point and setting == ""):
        return
    explicit_dir = setting if setting not in ("", "1") else ""
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    cache_dir = explicit_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "camera_calibration_tpu",
        f"jax_cache-{platform}",
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimization, never a requirement
        pass


def host_device_ctx():
    """Context manager pinning the default device to a LOCAL CPU device.

    Host-orchestration solves (P3P polish, RS bootstrap, model fits) use
    this so tiny/long-running programs never round-trip a remote
    accelerator.  No-op when no CPU backend exists.  Always a LOCAL
    device: under jax.distributed, ``jax.devices("cpu")[0]`` is the
    globally-first device, which on non-zero processes belongs to
    another host and hangs every pinned computation.
    """
    import contextlib

    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except (RuntimeError, IndexError):
        return contextlib.nullcontext()


def effective_backend() -> str:
    """Platform that uncommitted computations actually run on.

    ``jax.default_backend()`` reports the highest-priority platform even
    when ``jax_default_device`` pins execution elsewhere (the
    mixed-precision polish pins the CPU backend on TPU machines so f64
    work never reaches the 32-bit-only TPU runtime); Pallas-kernel gates
    must follow the pin, not the platform list.
    """
    dd = jax.config.jax_default_device
    if dd is not None:
        platform = getattr(dd, "platform", None)
        if platform is not None:
            return platform
        return str(dd)
    return jax.default_backend()


configure_platforms()
configure_precision()
configure_compilation_cache()  # no-op unless CCTPU_JAX_CACHE opts in
