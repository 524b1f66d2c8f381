"""Test configuration: force a hermetic 8-device virtual CPU mesh.

The container's sitecustomize registers the axon TPU plugin and forces
``jax_platforms=axon`` programmatically (so the JAX_PLATFORMS env var alone is
not enough). Tests override it back to CPU before any backend initialization.
Multi-chip sharding is exercised on the virtual CPU mesh; benchmarks run
separately on real TPU hardware via bench.py.
"""

import os

# Circuit/chain-divergence canary in synthesize() (see circuits/spec.py).
os.environ.setdefault("VIMZ_DEBUG_CHECK", "1")
# One tiny fold-pair batch shape for the whole suite: every EC/fold kernel
# compiles once at (8, ...) instead of per-circuit 64-lane shapes (XLA CPU
# compiles of the EC graphs are minutes each on a 2-vCPU box).
os.environ.setdefault("VIMZ_PAIR_CHUNK", "8")
# Small MSM batches: the ladder/Pippenger execution work scales with the
# (padded) batch, and XLA CPU executes the limb kernels ~100x slower than
# the TPU path; 8-instance chunks keep each MSM call seconds, not minutes.
os.environ.setdefault("VIMZ_MSM_CHUNK", "8")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the limb/EC kernels are compile-heavy; reuse
# compiled artifacts across test runs. Keyed per host CPU (foreign CPU AOT
# entries segfault — see vimz_tpu.utils.backend.compile_cache_dir).
from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache("cpu")


def _source_fingerprint(root) -> str:
    import glob
    import hashlib

    h = hashlib.sha256()
    for src in sorted(glob.glob(str(root / "vimz_tpu" / "**" / "*.py"), recursive=True)):
        with open(src, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def pytest_sessionstart(session):
    """Pre-warm the persistent compile cache on cold machines.

    This jaxlib's XLA CPU pipeline segfaults intermittently in processes
    that perform MANY fresh compiles (observed in both backend_compile and
    executable.serialize; single-file runs never crash). Cache entries
    persist monotonically, so warming per test FILE in crash-isolated
    subprocesses (retried once) makes the real in-process run read-mostly
    and stable. Keyed by a digest of the vimz_tpu sources; warm runs skip
    themselves via VIMZ_WARM_CHILD.
    """
    import glob
    import pathlib
    import subprocess
    import sys

    if os.environ.get("VIMZ_WARM_CHILD") or os.environ.get("VIMZ_NO_WARM"):
        return
    if getattr(session.config.option, "collectonly", False):
        return
    root = pathlib.Path(session.config.rootpath)
    from vimz_tpu.utils.backend import compile_cache_dir

    cdir = compile_cache_dir("cpu")
    os.makedirs(cdir, exist_ok=True)
    fp = _source_fingerprint(root)
    files = sorted(glob.glob(str(root / "tests" / "test_*.py")))
    todo = [
        f for f in files
        if not os.path.exists(
            os.path.join(cdir, f"warmed-{fp}-{os.path.basename(f)}")
        )
    ]
    if not todo:
        return
    env = dict(os.environ, VIMZ_WARM_CHILD="1")
    log_path = os.path.join(cdir, "warm.log")

    # Two files warm concurrently (matches this box's cores); per-file
    # markers make an interrupted warm resume instead of restarting.
    def warm_one(f, log):
        for _ in range(2):
            rc = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-q", "-x"],
                env=env, cwd=root, stdout=log, stderr=log,
            ).returncode
            if rc == 0:
                break
        with open(os.path.join(cdir, f"warmed-{fp}-{os.path.basename(f)}"), "w"):
            pass

    import concurrent.futures as cf

    with open(log_path, "ab") as log:
        workers = min(2, max(1, os.cpu_count() or 1))
        with cf.ThreadPoolExecutor(workers) as ex:
            list(ex.map(lambda f: warm_one(f, log), todo))
