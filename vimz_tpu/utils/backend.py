"""Backend selection helpers.

The deployment container force-selects the axon TPU platform from
sitecustomize; `force_cpu` routes computation back to host CPU (used by tests
and CLI tools that only need exact integer arithmetic, where per-op dispatch
to a tunneled TPU would dominate runtime).
"""

from __future__ import annotations

import os


def compile_cache_dir(platform: str = "tpu") -> str:
    """Persistent XLA compile cache directory.

    TPU compiles happen server-side on the TPU host, so their cache entries
    are portable across build machines and live in one shared directory.
    CPU entries are host-specific (AOT-compiled for the exact CPU feature
    set; loading foreign ones SIGILLs), so the CPU cache is keyed by a
    digest of the host's CPU flags.
    """
    if platform != "cpu":
        return os.path.expanduser("~/.cache/jax-vimz")
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.sha256(flags.encode()).hexdigest()[:12]
    return os.path.expanduser(f"~/.cache/jax-vimz-cpu-{tag}")


def enable_compile_cache(platform: str = "tpu") -> None:
    """Enable JAX's persistent compilation cache.

    On CPU the embedded XLA-side caches must be excluded
    (jax_persistent_cache_enable_xla_caches='none'): serializing them
    SIGSEGVs inside put_executable_and_time for some kernels in this
    jaxlib (observed in the test suite). The executable cache itself
    round-trips fine with them disabled.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", compile_cache_dir(platform))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if platform == "cpu":
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Select the CPU backend (optionally with N virtual devices for mesh tests).

    Must be called before the first JAX computation.
    """
    if n_virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def cpu_mesh_devices(n: int):
    import jax

    devices = jax.devices("cpu")
    assert len(devices) >= n, f"need {n} cpu devices, have {len(devices)}"
    return devices[:n]
