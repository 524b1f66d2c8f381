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
