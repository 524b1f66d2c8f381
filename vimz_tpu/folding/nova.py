"""Tree-parallel Nova-style folding prover and verifier.

The reference folds its per-row instances strictly sequentially
(sonobe `prove_step` in a loop, vimz/src/sonobe_backend/folding.rs:52-65),
which serializes one large MSM per row. This framework restructures the IVC
TPU-first:

- every step is an independent committed relaxed-R1CS instance whose public
  IO is the state transition x_i = (z_i, z_{i+1}) — chaining is checked on
  the public IO, so folding order is free;
- all leaf witness commitments are computed up front (batched MSMs), with a
  fast masked tree-sum path for bit-valued wires (the majority of every step
  circuit's witness) and Pippenger for the full-width wires;
- instances are folded pairwise in a binary tree: each level computes all
  cross terms with batched matvec calls and all cross-term commitments with
  batched MSMs, so the serial depth is log2(steps) instead of steps.

The leaf count is padded to a power of two with all-zero relaxed instances
(u = 0, W = 0, E = 0, x = 0 — trivially satisfied). Folding against a zero
instance is the identity, so those pairs are skipped (no cross term, no
commitment); both prover and verifier derive the skip pattern from the step
count alone. Device work is issued in fixed-size pair chunks so XLA compiles
one kernel shape per operation, not one per tree level.

Soundness rests on the standard Nova folding lemma applied at every tree
node, with Fiat–Shamir challenges binding the node's children and cross-term
commitment (see folding/transcript.py). The transcript is a Merkle-style
tree: a node's challenge r = H(D_left, D_right, comm_T) doubles as its
digest, so it recursively binds every leaf commitment and cross term below
it, and the folded commitments themselves never enter the transcript. Both
prover and verifier therefore track commitments only as host-side challenge
-product coefficients; the final cw/ce are linear combinations of the leaf
and cross-term points (two host mini-MSMs), and the verifier does NO
per-level EC work at all.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vimz_tpu.curves import BatchedCurve, bn254_batched
from vimz_tpu.fields.limbs import FR_LIMBS
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.folding.transcript import (
    fold_challenge,
    fold_challenges_batch,
    instance_digest,
    instance_digests_batch,
)
from vimz_tpu.r1cs.builder import R1CS


def _stack_points(points: list[dict]) -> dict:
    return {k: jnp.stack([p[k] for p in points]) for k in points[0]}


def _index_points(pts: dict, sl) -> dict:
    return {k: v[sl] for k, v in pts.items()}


def _concat_points(parts: list[dict]) -> dict:
    return {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


# Process-wide MSM engine cache: (curve, table?, kind, identity) -> engine.
# Prover and verifier over the same circuit share engines (tables + traced
# jits); see _FoldCore._make_engine.
_ENGINE_CACHE: dict[tuple, object] = {}


class _RowStore:
    """Row-partitioned device array with progressive release.

    Holds a logical (N, ...) array as a list of row chunks so consumed
    prefixes can be freed (JAX arrays are immutable; slicing keeps the parent
    buffer alive — chunking is the only way to cap peak HBM through the fold
    tree).
    """

    def __init__(self, chunks: list):
        self.chunks = list(chunks)
        self.sizes = [c.shape[0] for c in self.chunks]

    @property
    def n(self) -> int:
        return sum(self.sizes)

    def gather(self, lo: int, hi: int):
        parts = []
        pos = 0
        for c, sz in zip(self.chunks, self.sizes):
            a, b = max(lo - pos, 0), min(hi - pos, sz)
            if a < b:
                assert c is not None, "gather from released chunk"
                parts.append(c[a:b])
            pos += sz
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def release_below(self, upto: int):
        pos = 0
        for i, sz in enumerate(self.sizes):
            if pos + sz <= upto:
                self.chunks[i] = None
            pos += sz


@dataclass
class FoldProof:
    state_len: int
    steps: int
    x_rows: np.ndarray  # (S, 2*state_len) object ints
    leaf_comm_w: list  # S affine points / None
    node_comm_t: list  # per level: list of affine comm_T (real-real pairs only)
    u_final: int
    # Uncompressed mode: the folded witness/error vectors in the clear.
    w_final: np.ndarray | None = None  # (n_wit,) object ints
    e_final: np.ndarray | None = None  # (n_constraints,) object ints
    # Hiding mode: the folded Pedersen blinds for the final W/E commitments
    # (commitments are C = <v, G> + r*H; None = proof made with hiding off).
    r_w_final: int | None = None
    r_e_final: int | None = None
    # Compressed mode: a Spartan-style proof of the final instance instead
    # (the reference's CompressedSNARK stage, nova_snark_backend/mod.rs:52-67).
    spartan: object = None

    def size_bytes(self) -> int:
        pts = len(self.leaf_comm_w) + sum(len(l) for l in self.node_comm_t)
        n = pts * 64 + len(self.x_rows.ravel()) * 32
        if self.w_final is not None:
            n += (len(self.w_final) + len(self.e_final)) * 32
        if self.r_w_final is not None:
            n += 64
        if self.spartan is not None:
            n += self.spartan.size_bytes()
        return n


class _FoldCore:
    """Shared prover/verifier machinery over one step circuit."""

    PAIR_CHUNK = 64
    PAIR_CHUNK_SMALL = 8
    MSM_CHUNK = 32
    LEAF_CHUNK: int | None = None  # test override for prove()'s chunk size
    # HBM budget for one fold-level pair batch's live set (v5e has 16 GB;
    # leave room for the chunk z/e stores, MSM temps and XLA slack).
    PAIR_MEM_BUDGET = int(3.0e9)

    def __init__(
        self, dr1cs: DeviceR1CS, curve: BatchedCurve | None = None, mesh=None
    ):
        self.d = dr1cs
        self.curve = curve or bn254_batched()
        self.f = FR_LIMBS
        # Multi-chip: shard the step/pair/instance axis of the heavy batched
        # kernels over `mesh`'s 'fold' axis (pure data parallelism — per
        # instance work is independent, so the sharded prove is bit-identical
        # to the single-device one; see parallel/mesh.py).
        self.mesh = mesh
        # msm implementation: "pippenger" (default) or "ladder" (the
        # compile-light double-and-add path — used by the CPU dry run).
        import os as _os

        self.msm_impl = _os.environ.get("VIMZ_MSM_IMPL", "pippenger")
        self.MSM_CHUNK = int(_os.environ.get("VIMZ_MSM_CHUNK", self.MSM_CHUNK))
        # Pallas-fused MSM engines (TPU only), one per base-set length.
        self._pl_msm: dict[int, object] = {}
        self._pl_ok = (
            jax.default_backend() != "cpu"
            and self.msm_impl == "pippenger"
            and _os.environ.get("VIMZ_PALLAS_MSM", "1") not in ("", "0")
        )
        # Adaptive pair batch: one fold pair's live set through cross_term +
        # fold kernels is ~ (4*n_wires + 10*n_constraints) limb vectors of
        # 64 B each (z1/z2/new_z gathers + matvec outputs + T + e1/e2/new_e).
        env = _os.environ.get("VIMZ_PAIR_CHUNK")
        if env:
            # Test/CI override: tiny fixed batches keep every EC/fold kernel
            # at one small compile-cheap shape across the whole suite.
            self.PAIR_CHUNK = int(env)
        else:
            per_pair = (4 * dr1cs.n_wires + 10 * dr1cs.n_constraints) * 64
            cap = max(1, self.PAIR_MEM_BUDGET // per_pair)
            cap = 1 << (cap.bit_length() - 1)  # floor to a power of two
            self.PAIR_CHUNK = int(max(self.PAIR_CHUNK_SMALL, min(64, cap)))
        self.n_wit = dr1cs.n_wires - 1 - dr1cs.n_pub
        n_bases = max(self.n_wit, dr1cs.n_constraints)
        self.bases = self.curve.pedersen_bases(n_bases)
        # witness wire classes for the split leaf commitment
        bit_mask = getattr(dr1cs, "bit_mask", None)
        if bit_mask is not None:
            wmask = bit_mask[1 + dr1cs.n_pub :]
            self._bit_idx = np.where(wmask)[0].astype(np.int32)
            self._full_idx = np.where(~wmask)[0].astype(np.int32)
        else:
            self._bit_idx = np.zeros(0, dtype=np.int32)
            self._full_idx = np.arange(self.n_wit, dtype=np.int32)
        if len(self._bit_idx):
            nb = _pow2(len(self._bit_idx))
            bb = _index_points(self.bases, self._bit_idx)
            pad = nb - len(self._bit_idx)
            # pad bases are projective infinity (0 : y : 0)
            self._bit_bases = {
                "x": jnp.concatenate([bb["x"], jnp.zeros((pad, 16), dtype=jnp.uint32)]),
                "y": jnp.concatenate([bb["y"], jnp.broadcast_to(bb["y"][:1], (pad, 16))]),
                "z": jnp.concatenate([bb["z"], jnp.zeros((pad, 16), dtype=jnp.uint32)]),
            }
            self._full_bases = _index_points(self.bases, self._full_idx)
        else:
            self._bit_bases = None
            self._full_bases = None

    def _use_table(self) -> bool:
        """Subset-table MSM engine (curves/table_msm.py) — the default on
        TPU; VIMZ_MSM_TABLE=0 falls back to the sort-based Pippenger walk."""
        import os as _os

        return _os.environ.get("VIMZ_MSM_TABLE", "1") not in ("", "0")

    def _make_engine(self, bases_nm, cache_key=None):
        """Engines are PROCESS-wide (keyed by curve + base-set identity):
        a verifier instance re-creating them would re-build ~1 GB of tables
        and re-trace every engine jit (static self) — the bench's first
        verify paid ~700 s doing exactly that."""
        if cache_key is not None and cache_key in _ENGINE_CACHE:
            return _ENGINE_CACHE[cache_key]
        if self._use_table():
            from vimz_tpu.curves.table_msm import PallasTableMsm

            eng = PallasTableMsm(self.curve.ref, self.curve.f, bases_nm)
        else:
            from vimz_tpu.curves.pallas_msm import PallasMsm

            eng = PallasMsm(self.curve.ref, self.curve.f, bases_nm)
        if cache_key is not None:
            _ENGINE_CACHE[cache_key] = eng
        return eng

    def _pallas_msm_for(self, n: int):
        """Pallas MSM engine over the first n Pedersen bases, or None."""
        if not self._pl_ok or n is None or n < 2048:
            return None
        if n not in self._pl_msm:
            key = (self.curve.ref.name, self._use_table(), "prefix", n)
            self._pl_msm[n] = self._make_engine(
                _index_points(self.bases, slice(0, n)), cache_key=key
            )
        return self._pl_msm[n]

    # -- chunk helpers ---------------------------------------------------

    def _chunk_size(self, n: int) -> int:
        """Power-of-two pair-batch sizes in [8, 64]: few compiled shapes,
        bounded padding waste as tree levels halve."""
        return max(self.PAIR_CHUNK_SMALL, min(self.PAIR_CHUNK, _pow2(n)))

    def _shard(self, arr):
        """Place a batched array with its leading axis sharded over the
        mesh's 'fold' axis (no-op without a mesh). Downstream jitted kernels
        inherit the sharding, so XLA partitions them SPMD."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as PSpec

        if arr.shape[0] % self.mesh.devices.size != 0:
            return arr
        spec = PSpec("fold", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    # -- commitments -------------------------------------------------------

    def commit(self, scalars_std) -> dict:
        """(N, 16) standard-form scalars -> Pedersen commitment point."""
        n = scalars_std.shape[0]
        if self.msm_impl == "host":
            out = self._msm_host(np.asarray(scalars_std)[None])
            return {k: v[0] for k, v in out.items()}
        bases = _index_points(self.bases, slice(0, n))
        if self.msm_impl == "ladder":
            return self.curve.msm_ladder(scalars_std, bases)
        return self.curve.msm(scalars_std, bases)

    def _base_affine(self, n: int) -> list:
        """First n Pedersen bases as host affine points (cached)."""
        if getattr(self, "_base_aff_n", 0) < n:
            self._base_aff = self.curve.to_affine_ints(
                _index_points(self.bases, slice(0, n))
            )
            self._base_aff_n = n
        return self._base_aff[:n]

    def _msm_host(self, scalars_std_np) -> dict:
        """(m, N, 16) std limbs -> (m,) device point stack via the exact
        host Pippenger (CurveRef.msm_pippenger). Used by the multi-chip dry
        run on CPU-only hosts, where executing the XLA limb MSM kernels is
        the dominant cost (~100x roofline) and compiling them is minutes."""
        f = self.f
        m, n = scalars_std_np.shape[0], scalars_std_np.shape[1]
        bases_aff = self._base_affine(n)
        vals = f.from_limbs(scalars_std_np)
        pts = [
            self.curve.ref.msm_pippenger(vals[i], bases_aff) for i in range(m)
        ]
        return self.curve.from_affine_ints(pts)

    def commit_many(self, scalars_std, chunk: int | None = None) -> dict:
        """(m, N, 16) -> stacked points (m,) — vmapped MSM kernels.

        Instances are processed `chunk` at a time so the per-window gathered
        point buffers stay bounded at HD scale (720 instances x ~1e5 bases).
        """
        chunk = chunk or self.MSM_CHUNK
        m, n = scalars_std.shape[0], scalars_std.shape[1]
        bases = _index_points(self.bases, slice(0, n))
        return self._msm_chunked(scalars_std, bases, chunk, prefix_n=n)

    def _msm_chunked(self, scalars_std, bases, chunk: int, prefix_n=None) -> dict:
        """msm_many in exact `chunk`-instance batches (tail zero-padded) so
        one (chunk, N) kernel shape serves every call site per base set.

        `prefix_n`: set when `bases` is the canonical prefix of the Pedersen
        base set (enables the Pallas engine, which is cached per prefix)."""
        if self.msm_impl == "host":
            return self._msm_host(np.asarray(scalars_std))
        m = scalars_std.shape[0]
        pad = (-m) % chunk
        if pad:
            scalars_std = jnp.concatenate(
                [scalars_std, jnp.zeros((pad,) + scalars_std.shape[1:], dtype=scalars_std.dtype)]
            )
        pl_engine = self._pallas_msm_for(prefix_n) if prefix_n else None
        if pl_engine is not None:
            msm = lambda s, _b: pl_engine.msm_many(s)
        elif self.msm_impl == "ladder":
            msm = self.curve.msm_many_ladder
        else:
            msm = self.curve.msm_many
        parts = [
            msm(self._shard(scalars_std[i : i + chunk]), bases)
            for i in range(0, m + pad, chunk)
        ]
        return {k: jnp.concatenate([p[k] for p in parts])[:m] for k in parts[0]}

    def _pallas_leaf_engines(self):
        """(bit_engine, full_engine) PallasMsm pair for the leaf split."""
        if not self._pl_ok or self._bit_bases is None or len(self._bit_idx) < 2048:
            return None, None
        if "leaf" not in self._pl_msm:
            import hashlib

            sig = hashlib.sha256(self._bit_idx.tobytes()).hexdigest()[:16]
            bit_e = self._make_engine(
                _index_points(self.bases, self._bit_idx),
                cache_key=(self.curve.ref.name, self._use_table(), "bit", sig),
            )
            full_e = (
                self._make_engine(
                    self._full_bases,
                    cache_key=(self.curve.ref.name, self._use_table(), "full", sig),
                )
                if len(self._full_idx) >= 1024
                else None
            )
            self._pl_msm["leaf"] = (bit_e, full_e)
        return self._pl_msm["leaf"]

    def commit_witnesses(self, w_std) -> dict:
        """Leaf witness commitments (m, n_wit) with the bit/full class split.

        The split exists only on the Pallas path (TPU): bit-valued wires go
        through the masked tree-sum engine, full-width wires through the
        Pippenger engine. Everywhere else (ladder mode, CPU, no Pallas) one
        dedup-Pippenger/ladder MSM over all wires computes the identical
        group sums from compile-cheap kernels (the XLA masked-tree split
        costs ~10 min of XLA CPU compile)."""
        bit_e, full_e = self._pallas_leaf_engines()
        if self.msm_impl in ("ladder", "host") or bit_e is None:
            return self.commit_many(w_std)
        m = w_std.shape[0]
        chunk = self.MSM_CHUNK
        bit_scalars = w_std[:, self._bit_idx, 0]  # value = low limb (0/1)
        parts = []
        for i in range(0, m, chunk):
            sl = bit_scalars[i : i + chunk]
            if sl.shape[0] < chunk:
                sl = jnp.concatenate(
                    [sl, jnp.zeros((chunk - sl.shape[0], sl.shape[1]), dtype=jnp.uint32)]
                )
            parts.append(bit_e.masked_sum(self._shard(sl)))
        comm_bit = {k: jnp.concatenate([p[k] for p in parts])[:m] for k in parts[0]}
        if len(self._full_idx):
            if full_e is not None:
                fparts = []
                fsc = w_std[:, self._full_idx]
                for i in range(0, m, chunk):
                    sl = fsc[i : i + chunk]
                    if sl.shape[0] < chunk:
                        sl = jnp.concatenate(
                            [sl, jnp.zeros((chunk - sl.shape[0],) + sl.shape[1:], dtype=jnp.uint32)]
                        )
                    fparts.append(full_e.msm_many(self._shard(sl)))
                comm_full = {
                    k: jnp.concatenate([p[k] for p in fparts])[:m] for k in fparts[0]
                }
            else:
                comm_full = self._msm_chunked(
                    w_std[:, self._full_idx], self._full_bases, chunk
                )
            return self.curve.add_points(comm_bit, comm_full)
        return comm_bit

    # -- point helpers -----------------------------------------------------

    def to_affine(self, pts: dict) -> list:
        return self.curve.to_affine_ints(pts)

    @partial(jax.jit, static_argnums=0)
    def fold_points(self, p1: dict, p2: dict, r_std) -> dict:
        """p1 + r * p2, batched (jitted: called from host-driven loops)."""
        return self.curve.add(p1, self.curve.scalar_mul(r_std, p2))

    def _pad_points(self, pts: dict, n: int) -> dict:
        m = pts["z"].shape[0]
        if m == n:
            return pts
        inf = self.curve.infinity((n - m,))
        return _concat_points([pts, inf])

    def _r_limbs(self, rs: list[int]):
        std = jnp.asarray(self.f.to_limbs(np.array(rs, dtype=object)))
        mont = jnp.asarray(self.f.to_limbs_mont(np.array(rs, dtype=object)))
        return std, mont

    def _zero_digest(self) -> int:
        return instance_digest(0, [0] * self.d.n_pub, None, None)

    @staticmethod
    def _pad_batch(a, chunk: int):
        """Pad the leading (batch) axis up to `chunk` with zeros so a call
        reuses an existing compiled kernel shape."""
        m = a.shape[0]
        if m == chunk:
            return a
        pad = jnp.zeros((chunk - m,) + a.shape[1:], dtype=a.dtype)
        return jnp.concatenate([a, pad])

    # -- hiding commitments (SECURITY.md §1) -----------------------------

    @staticmethod
    def hiding_enabled() -> bool:
        import os as _os

        return _os.environ.get("VIMZ_HIDING", "1") not in ("", "0")

    def _rand_scalars(self, n: int, rng) -> list[int]:
        """n uniform blinds in [0, P). rng=None -> cryptographic randomness
        (secrets); a numpy Generator gives the deterministic path tests use
        to compare two proves bit-for-bit."""
        if rng is None:
            import secrets

            return [secrets.randbelow(P) for _ in range(n)]
        out = []
        for row in rng.integers(0, 1 << 62, size=(n, 5)):
            acc = 0
            for v in row:
                acc = (acc << 62) | int(v)
            out.append(acc % P)
        return out

    def _h_aff(self):
        """The hiding generator H as a host affine point (cached)."""
        if not hasattr(self, "_h_aff_pt"):
            self._h_aff_pt = self.curve.ref.hash_to_point(b"vimz-tpu-pedersen-H", 0)
        return self._h_aff_pt

    def blind_comms(self, comms_dev: dict, rs: list[int]) -> dict:
        """comms + r*H over an (m,) device point stack, issued in PAIR_CHUNK
        batches so it reuses the fold_points kernel instance every other
        commitment fold already compiled."""
        B = self.PAIR_CHUNK
        m = comms_dev["z"].shape[0]
        H = self.curve.blinding_base()
        Hb = {k: jnp.broadcast_to(v[0], (B, 16)) for k, v in H.items()}
        rs = list(rs) + [0] * (m - len(rs))
        parts = []
        for i in range(0, m, B):
            seg = {k: v[i : i + B] for k, v in comms_dev.items()}
            k_n = seg["z"].shape[0]
            if k_n < B:
                seg = self._pad_points(seg, B)
            r_std, _ = self._r_limbs(rs[i : i + B] + [0] * (B - k_n))
            parts.append(self.fold_points(seg, Hb, r_std))
        out = _concat_points(parts)
        return {k: v[:m] for k, v in out.items()}

    @staticmethod
    def _merge_coeff_maps(m1: dict, m2: dict, r: int, extra=None) -> dict:
        """Coefficient map of a folded node: m1 + r*m2 (+ extra: r^k on a
        fresh key). Keys are disjoint (leaf/node sets of the two subtrees),
        so the merge is a plain union with the right side scaled."""
        out = dict(m1)
        for k, v in m2.items():
            out[k] = v * r % P
        if extra is not None:
            out[extra[0]] = extra[1] % P
        return out

    def _derive_final_comms(
        self, leaf_comm_aff: list, node_comm_t: list, cw_map: dict, ce_map: dict
    ) -> tuple:
        """Final (cw, ce) as linear combinations of the leaf witness
        commitments and the cross-term commitments, with the challenge
        products tracked in the tree walk's coefficient maps.

        Two host Pippenger MSMs over at most 2S-1 points (~1.5k at HD) —
        no device kernels, no extra compiled shapes; the points are host
        affine ints already (proof fields on the verifier side, chunk
        outputs on the prover side)."""
        ref = self.curve.ref
        lam, lpts = [], []
        for i, c in cw_map.items():
            if c and leaf_comm_aff[i] is not None:
                lam.append(c)
                lpts.append(leaf_comm_aff[i])
        mu, mpts = [], []
        for (lvl, idx), c in ce_map.items():
            pt = node_comm_t[lvl][idx]
            if c and pt is not None:
                mu.append(c)
                mpts.append(pt)
        cw = ref.msm_pippenger(lam, lpts) if lam else None
        ce = ref.msm_pippenger(mu, mpts) if mu else None
        return cw, ce

    def cross_terms_chunked(self, z1, u1, z2, u2):
        """d.cross_term over the pair axis in fixed-size chunks."""
        k = z1.shape[0]
        cs = self._chunk_size(k)
        pad = (-k) % cs
        if pad:
            zpad = jnp.zeros((pad,) + z1.shape[1:], dtype=z1.dtype)
            upad = jnp.zeros((pad, 16), dtype=u1.dtype)
            z1 = jnp.concatenate([z1, zpad])
            z2 = jnp.concatenate([z2, zpad])
            u1 = jnp.concatenate([u1, upad])
            u2 = jnp.concatenate([u2, upad])
        parts = [
            self.d.cross_term(z1[i : i + cs], u1[i : i + cs], z2[i : i + cs], u2[i : i + cs])
            for i in range(0, k + pad, cs)
        ]
        return jnp.concatenate(parts)[:k]

    ROW_BLOCK = 16384  # wire/constraint-axis block for wide elementwise kernels

    @staticmethod
    def _map_rows(fn, arrays, blk: int):
        """Apply an elementwise field fn over axis 1 in lax.map blocks.

        One fused field op over (batch, 1.5e5 wires) holds several
        (batch, n, 33) column temporaries at once — blocking the row axis
        bounds peak memory to (batch, blk) regardless of circuit size.
        """
        import jax.numpy as _jnp
        from jax import lax as _lax

        n = arrays[0].shape[1]
        pad = (-n) % blk
        if n + pad == blk:
            return fn(*arrays)
        stacked = []
        for a in arrays:
            if pad:
                a = _jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
            stacked.append(_jnp.moveaxis(a.reshape(a.shape[0], -1, blk, 16), 1, 0))
        out = _lax.map(lambda xs: fn(*xs), tuple(stacked))
        out = _jnp.moveaxis(out, 0, 1).reshape(arrays[0].shape[0], n + pad, 16)
        return out[:, :n] if pad else out

    @property
    def _ew(self):
        """Fused Pallas elementwise engine (TPU; None on CPU). Measured
        on-chip: the XLA limb path costs 10-15 s per fold kernel call at HD
        widths (~100x roofline); the fused kernels are ~2 memory passes."""
        if not hasattr(self, "_ew_engine"):
            from vimz_tpu.fields.pallas_ew import maybe_ew

            self._ew_engine = maybe_ew(self.f)
        return self._ew_engine

    def _fold_z_kernel(self, z1, z2, r_mont):
        if self._ew is not None:
            return self._ew.fold_z(z1, z2, r_mont[:, None, :])
        return self._fold_z_xla(z1, z2, r_mont)

    @partial(jax.jit, static_argnums=0)
    def _fold_z_xla(self, z1, z2, r_mont):
        f = self.f
        return self._map_rows(
            lambda a, b: f.add(a, f.mul(b, r_mont[:, None, :])),
            (z1, z2), self.ROW_BLOCK,
        )

    def _fold_e_kernel(self, e1, T, e2, r_mont, r2_mont):
        if self._ew is not None:
            return self._ew.fold_e(
                e1, T, e2, r_mont[:, None, :], r2_mont[:, None, :]
            )
        return self._fold_e_xla(e1, T, e2, r_mont, r2_mont)

    @partial(jax.jit, static_argnums=0)
    def _fold_e_xla(self, e1, T, e2, r_mont, r2_mont):
        f = self.f
        return self._map_rows(
            lambda a, t, b: f.add(
                a, f.add(f.mul(t, r_mont[:, None, :]), f.mul(b, r2_mont[:, None, :]))
            ),
            (e1, T, e2), self.ROW_BLOCK,
        )

    def _fold_e0_kernel(self, T, r_mont):
        """Level-0 E fold: children have E = 0, so E' = r * T."""
        if self._ew is not None:
            return self._ew.mul_r(T, r_mont[:, None, :])
        return self._fold_e0_xla(T, r_mont)

    @partial(jax.jit, static_argnums=0)
    def _fold_e0_xla(self, T, r_mont):
        return self._map_rows(
            lambda t: self.f.mul(t, r_mont[:, None, :]), (T,), self.ROW_BLOCK
        )

    def _from_mont_rows(self, a):
        if self._ew is not None:
            return self._ew.from_mont(a)
        return self._from_mont_rows_xla(a)

    @partial(jax.jit, static_argnums=0)
    def _from_mont_rows_xla(self, a):
        return self._map_rows(self.f.from_mont, (a,), self.ROW_BLOCK)

    def _chunked3(self, fn, arrays, rs_list):
        """Apply fn(*chunks) over the leading axis in fixed-size chunks."""
        k = arrays[0].shape[0]
        cs = self._chunk_size(k)
        pad = (-k) % cs
        padded = []
        for a in arrays:
            if pad:
                a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)])
            padded.append(a)
        rs_padded = []
        for r in rs_list:
            if pad:
                r = jnp.concatenate([r, jnp.zeros((pad, 16), dtype=r.dtype)])
            rs_padded.append(r)
        parts = [
            fn(*[a[i : i + cs] for a in padded], *[r[i : i + cs] for r in rs_padded])
            for i in range(0, k + pad, cs)
        ]
        return jnp.concatenate(parts)[:k]


class FoldingProver(_FoldCore):
    """Streaming chunk-subtree fold prover.

    Leaves are produced in 128-step chunks (witness tape + commitments), and
    each chunk's subtree is folded all the way to its root before the next
    chunk's witnesses are generated; chunk roots are then folded by a small
    top tree. Because every tree node's Fiat–Shamir challenge binds only its
    two children and its own cross-term commitment, evaluation order is
    free: this produces a proof bit-identical to a global level-by-level
    fold, but peak HBM is one chunk's Z (~1.2 GB at HD) + its fold
    intermediates instead of all S leaves (~7 GB at HD, ~40 GB at 8K) — the
    memory plan that fits a 16 GB chip at any resolution.

    The level-0 E is never materialized (identically zero -> E' = r*T).
    """

    def prove(
        self,
        r1cs: R1CS,
        progress: bool = False,
        compress: bool = False,
        host_witness: bool = False,
        rng=None,
    ) -> FoldProof:
        from vimz_tpu.r1cs.witness import execute_tape
        from vimz_tpu.utils.tracing import span

        # Hiding commitments: every leaf witness commitment and cross-term
        # commitment carries a fresh Pedersen blind r*H; blinds fold with
        # the same linear combinations as the vectors (r' = r1 + rho*r2,
        # re' = re1 + rho*rt + rho^2*re2), so only the final blinds appear
        # in the proof. `rng` (tests only) makes the blinds deterministic.
        self._hiding = self.hiding_enabled()
        self._blind_rng = rng

        def leaf_witness(lo: int, hi: int):
            if host_witness:
                # Host-interpreted tape (exact Python ints) — used by the
                # multi-chip dry run where first-compiling the batched stage
                # kernels costs more than the tiny instances they compute.
                from vimz_tpu.r1cs.witness import execute_tape_host

                w = execute_tape_host(r1cs, lo, hi)
                limbs = self.f.to_limbs_mont(w)
                limbs = np.concatenate(
                    [limbs, np.zeros((hi - lo, 1, 16), dtype=np.uint32)], axis=1
                )
                return self._shard(jnp.asarray(limbs))
            sharding = None
            if self.mesh is not None and (hi - lo) % self.mesh.devices.size == 0:
                from jax.sharding import NamedSharding, PartitionSpec as PSpec

                sharding = NamedSharding(self.mesh, PSpec("fold", None, None))
            return execute_tape(r1cs, lo, hi, sharding=sharding)

        f, d = self.f, self.d
        S = r1cs.S
        state_len = r1cs.n_pub // 2
        nc = d.n_constraints

        # Leaf slots per chunk subtree: at least 64 so the witness executor
        # and leaf MSMs stay well batched even when the fold pair batch is
        # memory-capped small. LEAF_CHUNK overrides for tests exercising the
        # multi-chunk streaming + tail-overlap paths at tiny sizes.
        CS = self.LEAF_CHUNK or max(64, 2 * self.PAIR_CHUNK)
        # Each chunk folds only to span-SPAN sub-roots; all chunks' remaining
        # levels run together in the top tree at full pair batches (folding
        # every chunk to one root paid a full padded batch per tail level).
        SPAN = min(int(__import__("os").environ.get("VIMZ_CHUNK_SPAN", "8")), CS)
        sub_levels = (CS // SPAN).bit_length() - 1
        x_all = r1cs.inputs[:, : d.n_pub].copy()
        node_comm_t: dict[int, list] = {}
        leaf_comm_w_aff: list = []
        fronts: list[dict] = []

        for a in range(0, S, CS):
            b = min(a + CS, S)
            with span("leaf_chunk", lo=a, hi=b, wires=d.n_wires):
                # Tail chunk: recompute an overlapping full-width window so
                # the witness stage kernels keep their (CS, wires) shape —
                # ~40% of one chunk's tape work is far cheaper than compiling
                # a second full set of stage kernels for the odd tail shape.
                lo = b - CS if (b - a) < CS and S >= CS else a
                z_c = leaf_witness(lo, b)
                w_std_c = self._from_mont_rows(z_c[:, 1 + d.n_pub : d.n_wires])
                comm_w = self.commit_witnesses(w_std_c)
                if self._hiding:
                    r_ws = self._rand_scalars(b - lo, rng)
                    comm_w = self.blind_comms(comm_w, r_ws)
                else:
                    r_ws = [0] * (b - lo)
                comm_w_aff = self.to_affine(comm_w)
                if lo < a:
                    # Overlap rows were recomputed only to keep kernel
                    # shapes fixed; drop their witnesses and commitments.
                    z_c = z_c[a - lo :]
                    comm_w_aff = comm_w_aff[a - lo :]
                    r_ws = r_ws[a - lo :]
                leaf_comm_w_aff.extend(comm_w_aff)
            if progress:
                print(f"  leaf chunk {a}:{b} committed", flush=True)
            n = b - a
            state = dict(
                z_store=_RowStore([z_c]),
                e_store=None,
                cw_maps=[{a + i: 1} for i in range(n)],
                ce_maps=[{} for _ in range(n)],
                u=[1] * n,
                x=x_all[a:b].copy(),
                r_w=r_ws,
                r_e=[0] * n,
                digests=instance_digests_batch(
                    [1] * n, x_all[a:b], comm_w_aff, [None] * n
                ),
            )
            fronts.append(
                self._fold_to_root(
                    state, node_comm_t, 0, progress, max_levels=sub_levels
                )
            )
            if progress:
                print(
                    f"  chunk {a}:{b} folded to {len(fronts[-1]['u'])} sub-roots",
                    flush=True,
                )

        if len(fronts) == 1 and len(fronts[0]["u"]) == 1:
            final = fronts[0]
        else:
            state = dict(
                z_store=_RowStore([f["z"] for f in fronts]),
                e_store=_RowStore([f["e"] for f in fronts]),
                cw_maps=[c for f in fronts for c in f["cw_maps"]],
                ce_maps=[c for f in fronts for c in f["ce_maps"]],
                u=[v for f in fronts for v in f["u"]],
                x=np.concatenate([f["x"] for f in fronts]),
                r_w=[v for f in fronts for v in f["r_w"]],
                r_e=[v for f in fronts for v in f["r_e"]],
                digests=[v for f in fronts for v in f["digests"]],
            )
            final = self._fold_to_root(state, node_comm_t, sub_levels, progress)

        n_levels = max(node_comm_t) + 1 if node_comm_t else 0
        node_comm_t_list = [node_comm_t.get(l, []) for l in range(n_levels)]
        z_fin = final["z"][0]
        e_fin = final["e"][0]
        u_host = [final["u"][0]]
        x_rows = final["x"][0:1]
        node_comm_t = node_comm_t_list

        r_w_fin = final["r_w"][0] if self._hiding else None
        r_e_fin = final["r_e"][0] if self._hiding else None
        if compress:
            from vimz_tpu.snark import SpartanProver
            from vimz_tpu.utils.tracing import span as _span

            # Only the compression SNARK needs the final commitments as
            # actual points; the uncompressed verifier derives them itself.
            cw_fin, ce_fin = self._derive_final_comms(
                leaf_comm_w_aff, node_comm_t, final["cw_maps"][0],
                final["ce_maps"][0],
            )
            with _span("compress_snark"):
                sp = SpartanProver(d, self.curve)
                spartan = sp.prove(
                    u_host[0], list(x_rows[0]), cw_fin, ce_fin,
                    z_fin[: d.n_wires], e_fin,
                    r_w=r_w_fin or 0, r_e=r_e_fin or 0, rng=rng,
                )
            w_final = e_final = None
            # blinds stay inside the blinded IPA openings, never published
            r_w_fin = r_e_fin = None
        else:
            spartan = None
            w_final = f.from_limbs_mont(np.asarray(z_fin[1 + d.n_pub : d.n_wires]))
            e_final = f.from_limbs_mont(np.asarray(e_fin))

        return FoldProof(
            state_len=state_len,
            steps=S,
            x_rows=r1cs.inputs[:, : d.n_pub].copy(),
            leaf_comm_w=leaf_comm_w_aff,
            node_comm_t=node_comm_t,
            u_final=u_host[0],
            w_final=w_final,
            e_final=e_final,
            r_w_final=r_w_fin,
            r_e_final=r_e_fin,
            spartan=spartan,
        )

    def _fold_to_root(
        self,
        state: dict,
        node_sink: dict,
        level_offset: int,
        progress: bool = False,
        max_levels: int | None = None,
    ) -> dict:
        """Fold a front of instances through at most `max_levels` tree
        levels (None = all the way to one root). Stopping early lets the
        streaming prover leave each chunk at span-8 sub-roots and batch ALL
        chunks' tail levels together in the top tree — those tail levels
        otherwise fold 4/2/1 pairs in a full PAIR_CHUNK-padded batch each
        (~20 s of mostly-padding device work per level per chunk at HD).
        Level-based stopping keeps partial tail chunks aligned with the
        global tree's levels, and evaluation order does not change the
        proof: every node's challenge binds only its children, so the
        global tree (and the verifier's recomputation) is bit-identical.

        Transcript tree: a node's Fiat–Shamir challenge
        r = H(D_left, D_right, comm_T) doubles as the node's digest —
        it recursively binds every leaf commitment and cross term in the
        subtree (Merkle-style), so intermediate FOLDED commitment points
        are never needed for the transcript. Commitments are tracked as
        host-side coefficient maps (leaf index -> lambda, node -> mu):
        the final cw/ce are single linear combinations of the leaf and
        cross-term points, which the verifier recomputes with two small
        host MSMs instead of re-folding points level by level.

        `state` carries the device arrays (z/e row stores) and host
        bookkeeping (u scalars, public rows, digests, coefficient maps)
        for `active` instances. Every device call — cross terms, fold
        kernels, MSMs — runs at ONE fixed batch shape (PAIR_CHUNK pairs,
        tail-padded), so XLA compiles one kernel set per circuit
        regardless of tree depth. Emits each level's cross-term
        commitments into `node_sink[level_offset + level]` (global level)."""
        import jax as _jax

        from vimz_tpu.utils.tracing import span

        f, d = self.f, self.d
        nc = d.n_constraints
        bases_c = _index_points(self.bases, slice(0, nc))
        B = self.PAIR_CHUNK

        z_store: _RowStore = state["z_store"]
        e_store = state["e_store"]
        cw_maps = list(state["cw_maps"])
        ce_maps = list(state["ce_maps"])
        u_host = list(state["u"])
        x_rows = state["x"]
        r_w_host = list(state.get("r_w", [0] * len(u_host)))
        r_e_host = list(state.get("r_e", [0] * len(u_host)))
        digests = list(state["digests"])
        hiding = getattr(self, "_hiding", False)

        active = len(u_host)
        level = 0
        while active > 1 and (max_levels is None or level < max_levels):
            nfull, carry = active // 2, active % 2
            gl = level_offset + level
            # Index base of this call's nodes within the GLOBAL level list
            # (chunk subtrees extend each level strictly in leaf order, so
            # prover and verifier agree on (level, index) node addressing).
            node_base = len(node_sink.setdefault(gl, []))
            comm_t_affs: list = []
            rs_level: list[int] = []
            rt_level: list[int] = []
            new_z, new_e = [], []
            with span("fold_level", level=gl, pairs=nfull):
                for pa in range(0, nfull, B):
                    pb = min(pa + B, nfull)
                    k = pb - pa
                    pad = B - k
                    zseg = z_store.gather(2 * pa, 2 * pb)
                    z1, z2 = zseg[0::2], zseg[1::2]
                    if pad:
                        zp = jnp.zeros((pad,) + z1.shape[1:], dtype=z1.dtype)
                        z1 = jnp.concatenate([z1, zp])
                        z2 = jnp.concatenate([z2, zp])
                    u1 = jnp.asarray(f.to_limbs_mont(np.array(
                        u_host[2 * pa : 2 * pb : 2] + [0] * pad, dtype=object)))
                    u2 = jnp.asarray(f.to_limbs_mont(np.array(
                        u_host[2 * pa + 1 : 2 * pb : 2] + [0] * pad, dtype=object)))
                    z1, z2 = self._shard(z1), self._shard(z2)
                    u1, u2 = self._shard(u1), self._shard(u2)
                    T = d.cross_term(z1, u1, z2, u2)  # (B, nc, 16)
                    # Pad lanes carry garbage; their commitments are
                    # discarded host-side after to_affine. MSM batch = B so
                    # the constraint-base MSM has exactly one kernel shape.
                    comm_t = self._msm_chunked(
                        self._from_mont_rows(T), bases_c, min(self.MSM_CHUNK, B),
                        prefix_n=nc,
                    )
                    if hiding:
                        r_ts = self._rand_scalars(k, self._blind_rng)
                        comm_t = self.blind_comms(comm_t, r_ts)
                    else:
                        r_ts = [0] * k
                    rt_level.extend(r_ts)
                    comm_t_aff = self.to_affine(comm_t)[:k]
                    comm_t_affs.extend(comm_t_aff)
                    rs = fold_challenges_batch(
                        digests[2 * pa : 2 * pb : 2],
                        digests[2 * pa + 1 : 2 * pb : 2],
                        comm_t_aff,
                    )
                    rs_level.extend(rs)
                    r_std, r_mont = self._r_limbs(rs + [0] * pad)
                    new_z.append(self._fold_z_kernel(z1, z2, r_mont)[:k])
                    if e_store is None:
                        new_e.append(self._fold_e0_kernel(T, r_mont)[:k])
                    else:
                        eseg = e_store.gather(2 * pa, 2 * pb)
                        e1, e2 = eseg[0::2], eseg[1::2]
                        if pad:
                            ep = jnp.zeros((pad,) + e1.shape[1:], dtype=e1.dtype)
                            e1 = jnp.concatenate([e1, ep])
                            e2 = jnp.concatenate([e2, ep])
                        r2_std, r2_mont = self._r_limbs(
                            [r * r % P for r in rs] + [0] * pad
                        )
                        new_e.append(
                            self._fold_e_kernel(e1, T, e2, r_mont, r2_mont)[:k]
                        )
                    # free fully-consumed child chunks (carry row excluded:
                    # it sits at index 2*nfull >= 2*pb)
                    _jax.block_until_ready(new_z[-1])
                    z_store.release_below(2 * pb)
                    if e_store is not None:
                        e_store.release_below(2 * pb)

                if carry:
                    ci = 2 * nfull
                    new_z.append(z_store.gather(ci, ci + 1))
                    new_e.append(
                        e_store.gather(ci, ci + 1)
                        if e_store is not None
                        else jnp.zeros((1, nc, 16), dtype=jnp.uint32)
                    )

            z_store = _RowStore(new_z)
            e_store = _RowStore(new_e)

            u_next = [
                (u_host[2 * j] + rs_level[j] * u_host[2 * j + 1]) % P
                for j in range(nfull)
            ]
            rw_next = [
                (r_w_host[2 * j] + rs_level[j] * r_w_host[2 * j + 1]) % P
                for j in range(nfull)
            ]
            re_next = [
                (
                    r_e_host[2 * j]
                    + rs_level[j] * rt_level[j]
                    + rs_level[j] * rs_level[j] % P * r_e_host[2 * j + 1]
                )
                % P
                for j in range(nfull)
            ]
            x_next = (
                x_rows[0 : 2 * nfull : 2]
                + x_rows[1 : 2 * nfull : 2] * np.array(rs_level, dtype=object)[:, None]
            ) % P if nfull else np.zeros((0, d.n_pub), dtype=object)
            cw_next = [
                self._merge_coeff_maps(cw_maps[2 * j], cw_maps[2 * j + 1], rs_level[j])
                for j in range(nfull)
            ]
            ce_next = [
                self._merge_coeff_maps(
                    ce_maps[2 * j],
                    ce_maps[2 * j + 1],
                    rs_level[j] * rs_level[j] % P,
                    extra=((gl, node_base + j), rs_level[j]),
                )
                for j in range(nfull)
            ]
            # The node's challenge doubles as its transcript digest: it
            # already binds both child digests and the cross-term commitment.
            digests_next = list(rs_level)
            if carry:
                u_next.append(u_host[2 * nfull])
                rw_next.append(r_w_host[2 * nfull])
                re_next.append(r_e_host[2 * nfull])
                x_next = np.concatenate([x_next, x_rows[2 * nfull : 2 * nfull + 1]])
                cw_next.append(cw_maps[2 * nfull])
                ce_next.append(ce_maps[2 * nfull])
                digests_next.append(digests[2 * nfull])

            active = nfull + carry
            digests = digests_next
            u_host, x_rows = u_next, x_next
            r_w_host, r_e_host = rw_next, re_next
            cw_maps, ce_maps = cw_next, ce_next
            node_sink[gl].extend(comm_t_affs)
            level += 1
            if progress:
                print(
                    f"    level {level_offset + level} done "
                    f"({active} instances remain)",
                    flush=True,
                )

        n_left = len(u_host)
        return dict(
            z=z_store.gather(0, n_left),
            e=(
                e_store.gather(0, n_left)
                if e_store is not None
                else jnp.zeros((n_left, nc, 16), dtype=jnp.uint32)
            ),
            cw_maps=cw_maps,
            ce_maps=ce_maps,
            u=u_host,
            x=x_rows,
            r_w=r_w_host,
            r_e=r_e_host,
            digests=digests,
            levels=level,
        )


class FoldingVerifier(_FoldCore):
    def _point_ok(self, pt) -> bool:
        """Affine point sanity: None (infinity) or on-curve with reduced coords."""
        if pt is None:
            return True
        x, y = pt
        p = self.curve.ref.p
        return 0 <= x < p and 0 <= y < p and self.curve.ref.is_on_curve(pt)

    @staticmethod
    def _fail(reason: str) -> bool:
        """All verification failures route through here; VIMZ_VERIFY_DEBUG=1
        names the failing check (attacker-visible info is just the index)."""
        import os, sys

        if os.environ.get("VIMZ_VERIFY_DEBUG"):
            print(f"[verify] FAILED: {reason}", file=sys.stderr, flush=True)
        return False

    def verify(self, proof: FoldProof, z0: list[int], zn: list[int]) -> bool:
        import time as _time

        from vimz_tpu.utils.tracing import log as _vlog

        _tm = [_time.perf_counter()]

        def _mark(name):
            now = _time.perf_counter()
            _vlog(f"verify/{name}: {now - _tm[0]:.2f}s")
            _tm[0] = now

        f, d = self.f, self.d
        S = proof.steps
        Sp = _pow2(S)
        sl_len = proof.state_len
        # 0) shape/type validation of attacker-controlled proof components:
        # wrong lengths must yield False, not IndexErrors or (via JAX's
        # clamped out-of-bounds gathers) silently mis-bound commitments.
        if proof.x_rows.shape != (S, d.n_pub):
            return self._fail("x_rows shape")
        if S < 1 or sl_len * 2 != d.n_pub:
            return self._fail("steps/state_len")
        if len(proof.leaf_comm_w) != S:
            return self._fail("leaf_comm_w length")
        compressed = proof.spartan is not None
        if not compressed:
            if proof.w_final is None or proof.e_final is None:
                return self._fail("missing w/e final")
            if len(proof.w_final) != self.n_wit or len(proof.e_final) != d.n_constraints:
                return self._fail("w/e final lengths")
            if any(not (0 <= int(v) < P) for v in proof.w_final):
                return self._fail("w_final range")
            if any(not (0 <= int(v) < P) for v in proof.e_final):
                return self._fail("e_final range")
        for pt in proof.leaf_comm_w:
            if not self._point_ok(pt):
                return self._fail("leaf point invalid")
        for level in proof.node_comm_t:
            for pt in level:
                if not self._point_ok(pt):
                    return self._fail("node comm_T point invalid")
        if not (0 <= proof.u_final < P):
            return self._fail("u_final range")

        # 1) state chaining on public IO
        x_real = proof.x_rows % P
        if list(x_real[0, :sl_len]) != [v % P for v in z0]:
            return self._fail("z0 mismatch")
        if list(x_real[-1, sl_len:]) != [v % P for v in zn]:
            return self._fail("zn mismatch")
        for i in range(S - 1):
            if list(x_real[i, sl_len:]) != list(x_real[i + 1, :sl_len]):
                return self._fail("state chaining")
        _mark("validate")

        # 2) recompute the fold tree transcript: leaf digests, then one
        # batched challenge chain per level (a node's challenge IS its
        # digest — it binds both child digests and the cross-term
        # commitment recursively). Commitments are tracked as coefficient
        # maps; NO EC work happens in the tree walk.
        x_rows = np.zeros((Sp, d.n_pub), dtype=object)
        x_rows[:S] = x_real
        u_host = [1] * S + [0] * (Sp - S)
        cw_maps: list = [{i: 1} for i in range(S)] + [{} for _ in range(Sp - S)]
        ce_maps: list = [{} for _ in range(Sp)]
        zd = self._zero_digest()
        digests = instance_digests_batch(
            [1] * S, x_rows[:S], proof.leaf_comm_w, [None] * S
        ) + [zd] * (Sp - S)
        _mark("leaf_digests")

        active = S
        m = Sp
        level = 0
        for comm_t_aff in proof.node_comm_t:
            if m <= 1:
                return self._fail("tree exhausted early")
            k = m // 2
            nfull = active // 2
            carry = active % 2
            if len(comm_t_aff) != nfull:
                return self._fail("node_comm_t level length")
            rs = (
                fold_challenges_batch(
                    digests[0 : 2 * nfull : 2], digests[1 : 2 * nfull : 2], comm_t_aff
                )
                if nfull
                else []
            )
            u_next = [(u_host[2 * j] + rs[j] * u_host[2 * j + 1]) % P for j in range(nfull)]
            x_next = (
                x_rows[0 : 2 * nfull : 2]
                + x_rows[1 : 2 * nfull : 2] * np.array(rs, dtype=object)[:, None]
            ) % P if nfull else np.zeros((0, d.n_pub), dtype=object)
            cw_next = [
                self._merge_coeff_maps(cw_maps[2 * j], cw_maps[2 * j + 1], rs[j])
                for j in range(nfull)
            ]
            ce_next = [
                self._merge_coeff_maps(
                    ce_maps[2 * j],
                    ce_maps[2 * j + 1],
                    rs[j] * rs[j] % P,
                    extra=((level, j), rs[j]),
                )
                for j in range(nfull)
            ]
            digests_next = list(rs)
            if carry:
                ci = 2 * nfull
                u_next.append(u_host[ci])
                x_next = np.concatenate([x_next, x_rows[ci : ci + 1]])
                cw_next.append(cw_maps[ci])
                ce_next.append(ce_maps[ci])
                digests_next.append(digests[ci])

            nz = k - nfull - carry
            digests = digests_next + [zd] * nz
            cw_maps = cw_next + [{} for _ in range(nz)]
            ce_maps = ce_next + [{} for _ in range(nz)]
            u_host = u_next + [0] * nz
            x_rows = np.concatenate(
                [x_next, np.zeros((nz, d.n_pub), dtype=object)]
            ) if nz else x_next
            active = nfull + carry
            m = k
            level += 1
        if m != 1:
            return self._fail("tree not reduced to one root")
        if proof.u_final != u_host[0]:
            return self._fail("u_final mismatch")
        _mark("tree_walk")

        # Final commitments: two host mini-MSMs over the leaf and
        # cross-term points with the tree-derived challenge products.
        cw_root, ce_root = self._derive_final_comms(
            proof.leaf_comm_w, proof.node_comm_t, cw_maps[0], ce_maps[0]
        )
        _mark("derive_comms")

        if compressed:
            # 3') compression SNARK over the tree-derived final instance
            # (replaces the clear-witness opening + residual checks).
            from vimz_tpu.snark import SpartanVerifier

            sv = SpartanVerifier(self.d, self.curve)
            return sv.verify(
                proof.spartan, u_host[0], list(x_rows[0]), cw_root, ce_root
            )

        # 3) final opening checks (blinded: C = <v, G> + r*H, SECURITY.md §1)
        r_w = proof.r_w_final or 0
        r_e = proof.r_e_final or 0
        if not (0 <= r_w < P and 0 <= r_e < P):
            return self._fail("blind range")
        w_std = jnp.asarray(f.to_limbs(proof.w_final))
        e_std = jnp.asarray(f.to_limbs(proof.e_final))
        _mark("we_to_limbs")
        ref = self.curve.ref
        # Openings reuse the prover's engines/tables, but ALWAYS as
        # full-scalar MSMs: the FOLDED witness is a random linear
        # combination, so its "bit" wires are full-width field elements —
        # routing it through commit_witnesses' masked bit path read only
        # the low limb as a 0/1 mask and rejected every honest proof.
        # Single-instance MSM shapes: msm_many is shape-polymorphic per
        # batch, so B=1 calls avoid paying for MSM_CHUNK-1 padded lanes of
        # full-width MSM work (one extra compiled shape, persistently
        # cached — warm opening cost drops ~MSM_CHUNKx).
        bit_e, full_e = self._pallas_leaf_engines()
        if bit_e is not None:
            cw_pt = bit_e.msm_many(w_std[None, self._bit_idx])
            if len(self._full_idx):
                if full_e is not None:
                    fp = full_e.msm_many(w_std[None, self._full_idx])
                else:
                    fp = self._msm_chunked(
                        w_std[None, self._full_idx], self._full_bases, 1
                    )
                cw_pt = self.curve.add_points(cw_pt, fp)
            cw_exp = self.to_affine(cw_pt)[0]
        else:
            cw_exp = self.to_affine(self.commit_many(w_std[None]))[0]
        bases_c = _index_points(self.bases, slice(0, self.d.n_constraints))
        ce_exp = self.to_affine(
            self._msm_chunked(
                e_std[None], bases_c, 1, prefix_n=self.d.n_constraints
            )
        )[0]
        if r_w:
            cw_exp = ref.add(cw_exp, ref.mul(r_w, self._h_aff()))
        if r_e:
            ce_exp = ref.add(ce_exp, ref.mul(r_e, self._h_aff()))
        if cw_exp != cw_root:
            return self._fail("comm_w opening mismatch")
        if ce_exp != ce_root:
            return self._fail("comm_e opening mismatch")
        _mark("openings")

        # 4) relaxed R1CS satisfaction of the final instance
        z_full = np.concatenate(
            [np.array([u_host[0]], dtype=object), x_rows[0], proof.w_final]
        )
        z_mont = f.to_mont_j(jnp.asarray(f.to_limbs(z_full)))
        u_mont = jnp.asarray(f.to_limbs_mont(np.array(u_host[0], dtype=object)))
        e_mont = f.to_mont_j(jnp.asarray(e_std))
        res = d.residual(z_mont, u_mont, e_mont)
        out = bool(np.all(np.asarray(f.is_zero(res))))
        _mark("residual")
        return out
