"""Backend / device selection and the persistent jit cache.

TPU-native equivalent of the reference's OpenCL host runtime
(reference: kfusion/src/opencl/common_opencl.cpp:31-183 and
common_opencl.h:34-191), capability by capability:

* ``OPENCL_PLATFORM`` / ``OPENCL_DEVICE`` env-based platform and device
  selection (common_opencl.cpp:46-88) → ``SLAMBENCH_PLATFORM`` (jax
  backend name: ``tpu``/``cpu``/``gpu``) and ``SLAMBENCH_DEVICE``
  (device ordinal).
* runtime ``.cl`` compilation with build caching (common_opencl.cpp:
  95-150) → XLA's persistent compilation cache, pointed at
  ``SLAMBENCH_JIT_CACHE`` (critical on this project's tunneled TPU,
  where first compiles take minutes).
* device/build-log reporting (common_opencl.cpp:58-66,131-149) →
  ``device_report()``.
* the ``clGetErrorString`` code→string table (common_opencl.cpp:
  153-183) → ``explain_error()``, a failure→remedy table for the
  XLA/JAX error surface.

``select_backend()`` must run before the JAX backend initialises
(in this environment the ``JAX_PLATFORMS`` env var is overridden by the
TPU plugin, so ``jax.config.update`` is the reliable route).
"""

from __future__ import annotations

import os
import sys
from typing import Optional

DEFAULT_CACHE = os.path.expanduser("~/.cache/slambench_tpu/jit")

# Failure-signature → remedy table (the clGetErrorString analogue).
ERROR_HINTS = (
    ("RESOURCE_EXHAUSTED",
     "device HBM exhausted — lower --volume-resolution, raise "
     "--compute-size-ratio, or shard the volume with --mesh z:N"),
    ("Unable to initialize backend",
     "requested platform unavailable — set SLAMBENCH_PLATFORM=cpu (or "
     "unset it to use the plugin default)"),
    ("Mosaic", "Pallas TPU kernels need a TPU backend — on CPU use "
     "interpret mode (the pipeline's jnp path does this automatically)"),
    ("DATA_LOSS: Compilation caching", "stale jit cache — clear the "
     "SLAMBENCH_JIT_CACHE directory"),
    ("NaN", "--debug-nans faults on the producing op; tracking NaNs "
     "usually mean an empty/degenerate depth frame"),
)


def select_backend(env: str = "SLAMBENCH_PLATFORM") -> Optional[str]:
    """Honour the platform-selection env var (OPENCL_PLATFORM analogue).

    Returns the selected platform name, or None if unset. Must be called
    before any computation initialises the backend.
    """
    platform = os.environ.get(env)
    if platform:
        import jax
        jax.config.update("jax_platforms", platform.lower())
    return platform


def select_device(env: str = "SLAMBENCH_DEVICE"):
    """Honour the device-ordinal env var (OPENCL_DEVICE analogue): makes
    ``jax.devices()[N]`` the default device for uncommitted arrays.
    Returns the chosen device, or None if unset/out of range."""
    val = os.environ.get(env)
    if not val:
        return None
    import jax
    devices = jax.devices()
    try:
        idx = int(val)
    except ValueError:
        # Degrade like the out-of-range case (a typo'd ordinal should not
        # abort the run; the reference warns and falls back too).
        print(f"SLAMBENCH_DEVICE={val!r} is not a device ordinal; "
              "using default", file=sys.stderr)
        return None
    if not 0 <= idx < len(devices):
        print(f"SLAMBENCH_DEVICE={idx} out of range "
              f"(have {len(devices)} devices); using default",
              file=sys.stderr)
        return None
    jax.config.update("jax_default_device", devices[idx])
    return devices[idx]


def enable_jit_cache(path: Optional[str] = None,
                     env: str = "SLAMBENCH_JIT_CACHE") -> str:
    """Point XLA's persistent compilation cache at ``path`` (or the
    SLAMBENCH_JIT_CACHE env var, or the default user cache dir). The
    analogue of the reference's runtime-kernel-build route — and the
    practical answer to minutes-long first compiles on shared TPU
    endpoints."""
    import jax
    path = path or os.environ.get(env) or DEFAULT_CACHE
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took a noticeable compile.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def device_report(out=sys.stdout) -> None:
    """Print the platform/device table (the reference reports the chosen
    OpenCL platform/device and build logs, common_opencl.cpp:58-66)."""
    import jax
    print(f"platform: {jax.default_backend()}"
          f" (jax {jax.__version__})", file=out)
    for i, d in enumerate(jax.devices()):
        kind = getattr(d, "device_kind", "?")
        print(f"  device {i}: {d.platform}:{d.id} {kind}", file=out)


def explain_error(exc: BaseException) -> Optional[str]:
    """Map a JAX/XLA failure to a remedy, if its signature is known."""
    msg = f"{type(exc).__name__}: {exc}"
    for needle, hint in ERROR_HINTS:
        if needle in msg:
            return hint
    return None
