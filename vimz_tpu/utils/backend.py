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
    # v2: entries written before jax_persistent_cache_enable_xla_caches was
    # forced to 'none' embed XLA:CPU AOT results whose target features
    # (+prefer-no-scatter etc.) vary per process configuration — loading
    # them cross-process warns of SIGILL risk and slows deserialization.
    return os.path.expanduser(f"~/.cache/jax-vimz-cpu2-{tag}")


def raise_stack_limit(mb: int = 256) -> None:
    """Raise RLIMIT_STACK for the main thread.

    The unrolled limb-arithmetic graphs (an EC add is ~10^4 HLO ops; a
    masked commitment tree unrolls dozens of them) drive XLA's recursive
    CPU compiler passes deep enough to overflow the default 8 MB stack —
    observed as intermittent SIGSEGVs inside backend_compile and
    executable.serialize. The main-thread stack grows on demand up to the
    rlimit, so raising it at startup is sufficient for main-thread compiles.
    """
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = mb * 1024 * 1024
        if hard != resource.RLIM_INFINITY:
            want = min(want, hard)
        if soft != resource.RLIM_INFINITY and soft < want:
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
    except Exception:
        pass


def enable_compile_cache(platform: str = "tpu", read_only: bool = False) -> None:
    """Enable JAX's persistent compilation cache.

    On CPU the embedded XLA-side caches must be excluded
    (jax_persistent_cache_enable_xla_caches='none'): serializing them
    SIGSEGVs inside put_executable_and_time for some kernels in this
    jaxlib (observed in the test suite). The executable cache itself
    round-trips fine with them disabled.

    `read_only`: reuse cached executables but never write — for the
    multi-chip dry run, whose budget can't absorb a crashed/hung serialize
    and which must not fork (the crash-isolated writer forks a
    multithreaded JAX process).
    """
    import jax

    raise_stack_limit()
    jax.config.update("jax_compilation_cache_dir", compile_cache_dir(platform))
    if read_only:
        # practically disables writes; reads are unaffected
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    else:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if platform == "cpu":
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
        if not read_only:
            _fork_isolate_cache_writes()


_CACHE_WRITES_ISOLATED = False


def _fork_isolate_cache_writes() -> None:
    """Write persistent-cache entries from a forked child process.

    This jaxlib's CPU `executable.serialize()` SIGSEGVs for some executables
    (observed: donated-buffer scan kernels); an in-process crash would kill
    the whole test run. The child shares the cache directory, so successful
    writes land normally and a crashing serialize only loses that one entry.
    Reads are unaffected.
    """
    global _CACHE_WRITES_ISOLATED
    if _CACHE_WRITES_ISOLATED:
        return
    _CACHE_WRITES_ISOLATED = True

    import signal

    from jax._src import compilation_cache as cc

    orig = cc.put_executable_and_time

    def safe_put(cache_key, module_name, executable, backend, compile_time):
        try:
            pid = os.fork()
        except OSError:
            return
        if pid == 0:
            try:
                signal.alarm(30)  # a hung serialize must not leak children
                orig(cache_key, module_name, executable, backend, compile_time)
                os._exit(0)
            except BaseException:
                os._exit(1)
        try:
            os.waitpid(pid, 0)
        except ChildProcessError:
            pass

    # jax._src.compiler resolves this attribute at call time, so patching the
    # module attribute covers the only call site.
    cc.put_executable_and_time = safe_put


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
