"""Multi-chip sharding of the folding pipeline.

The reference has no distributed backend (single process, rayon threads;
SURVEY §2.2); the TPU-native scale-out axes here are:

- `fold`: data-parallel over fold-step instances — witness generation,
  leaf MSMs and per-level cross terms are embarrassingly parallel across
  steps/pairs, so arrays shard along their leading step axis.
- MSM point/bucket partitioning: each chip computes a Pedersen partial sum
  over its slice of bases, and partials are combined with an all_gather over
  ICI followed by a log-width projective reduction.

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


def sharded_msm_partials(
    curve, mesh: Mesh, scalars_std, points, c: int = 8, impl: str = "pippenger"
):
    """MSM with bases partitioned across chips.

    Each chip runs a local MSM over its slice of (scalars, points); the
    per-chip partial sums are all_gathered and combined with a small
    projective reduction on every chip (result replicated). impl="ladder"
    swaps in the compile-light double-and-add kernel (msm_ladder) — same
    sharding/collective structure, used by the CPU dry run where the
    Pippenger sort/scan machinery takes many minutes to compile.
    """
    n = scalars_std.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0, "pad scalars to a multiple of the mesh size"

    def local(scalars_shard, x, y, z):
        pts = {"x": x, "y": y, "z": z}
        if impl == "ladder":
            part = curve.msm_ladder(scalars_shard, pts)
        else:
            part = curve.msm(scalars_shard, pts, c)
        g = {k: jax.lax.all_gather(part[k], "fold") for k in part}
        np2 = 1 << max(0, (n_dev - 1).bit_length())
        if np2 != n_dev:  # pad with infinity (Z = 0) to a power of two
            pad = curve.infinity((np2 - n_dev,))
            g = {k: jnp.concatenate([g[k], pad[k]]) for k in g}
        acc = curve._pair_tree(g, np2)  # log-depth combine (3 adds at 8 chips)
        return acc["x"], acc["y"], acc["z"]

    # check_vma=False: the Pippenger bucket walk seeds its fori_loop carries
    # with freshly-created (unvarying) infinity points, which the VMA checker
    # rejects inside a manual region even though the computation is correct.
    # jit around shard_map is ESSENTIAL: un-jitted shard_map executes the
    # body op-by-op, compiling hundreds of tiny SPMD programs (the r1-r4
    # multichip dryrun stall).
    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(PSpec("fold", None),) * 4,
            out_specs=(PSpec(None),) * 3,
            check_vma=False,
        )
    )
    x, y, z = fn(scalars_std, points["x"], points["y"], points["z"])
    return {"x": x, "y": y, "z": z}
