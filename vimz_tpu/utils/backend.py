"""Backend selection helpers.

The deployment container force-selects the axon TPU platform from
sitecustomize; `force_cpu` routes computation back to host CPU (used by tests
and CLI tools that only need exact integer arithmetic, where per-op dispatch
to a tunneled TPU would dominate runtime).
"""

from __future__ import annotations

import os


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
