"""Multi-chip sharding of the folding pipeline.

The reference has no distributed backend (single process, rayon threads;
SURVEY §2.2); the TPU-native scale-out axes here are:

- `fold`: data-parallel over fold-step instances — witness generation,
  leaf MSMs and per-level cross terms are embarrassingly parallel across
  steps/pairs, so arrays shard along their leading step axis.
- MSM point/bucket partitioning: each chip computes a Pedersen partial sum
  over its slice of bases, and partials are combined with an all_gather over
  ICI followed by a log-width Jacobian reduction.

Everything uses jax.sharding.Mesh + NamedSharding/shard_map so XLA inserts
the collectives.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec


def fold_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("fold",))


def sharded_cross_term(d, mesh: Mesh, z1, u1, z2, u2):
    """Cross terms for a level of fold pairs, sharded over the pair axis."""
    spec3 = NamedSharding(mesh, PSpec("fold", None, None))
    spec2 = NamedSharding(mesh, PSpec("fold", None))
    z1 = jax.device_put(z1, spec3)
    z2 = jax.device_put(z2, spec3)
    u1 = jax.device_put(u1, spec2)
    u2 = jax.device_put(u2, spec2)
    fn = jax.jit(d.cross_term, out_shardings=spec3)
    return fn(z1, u1, z2, u2)


def sharded_msm_partials(curve, mesh: Mesh, scalars_std, points, c: int = 8):
    """MSM with bases partitioned across chips.

    Each chip runs a local Pippenger over its slice of (scalars, points);
    the per-chip partial sums are all_gathered and combined with a small
    Jacobian reduction on every chip (result replicated).
    """
    n = scalars_std.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, "pad scalars to a multiple of the mesh size"

    def local(scalars_shard, x, y, z):
        pts = {"x": x, "y": y, "z": z}
        part = curve.msm(scalars_shard, pts, c)
        gx = jax.lax.all_gather(part["x"], "fold")
        gy = jax.lax.all_gather(part["y"], "fold")
        gz = jax.lax.all_gather(part["z"], "fold")
        acc = {"x": gx[0], "y": gy[0], "z": gz[0]}
        for i in range(1, n_dev):
            acc = curve.add(acc, {"x": gx[i], "y": gy[i], "z": gz[i]})
        return acc["x"], acc["y"], acc["z"]

    # check_vma=False: the Pippenger bucket walk seeds its fori_loop carries
    # with freshly-created (unvarying) infinity points, which the VMA checker
    # rejects inside a manual region even though the computation is correct.
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(PSpec("fold", None),) * 4,
        out_specs=(PSpec(None),) * 3,
        check_vma=False,
    )
    x, y, z = fn(scalars_std, points["x"], points["y"], points["z"])
    return {"x": x, "y": y, "z": z}
