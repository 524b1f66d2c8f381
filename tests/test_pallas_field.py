"""Differential tests for the Pallas field/EC kernels (VERDICT r4 item 3).

The Pallas engines (fields/pallas_field.py, curves/pallas_msm.py) are the
default TPU commitment path; here they are exercised on every platform:
on CPU the kernels run in Pallas interpret mode (auto-enabled, see
pallas_field._interpret), on TPU they compile natively. Oracles are the
XLA limb curve (BatchedCurve) and the exact Python-int curve (CurveRef) —
two independent implementations of the same group law.

Shapes are tiny: each EC-add *instance* costs XLA CPU ~15-20 s of compile,
so the point counts stay at 16-32 while still covering the adversarial
inputs (infinity, doubling, inverse pairs, duplicate-heavy scalars, 0/1
and p-1 values).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vimz_tpu.curves import bn254_batched
from vimz_tpu.curves.curve import BN254_G1
from vimz_tpu.curves.pallas_msm import PallasMsm
from vimz_tpu.fields.limbs import FQ_LIMBS, FR_LIMBS
from vimz_tpu.fields.prime import P_FR


@pytest.fixture(scope="module")
def curve():
    return bn254_batched()


@pytest.fixture(scope="module")
def engine(curve):
    bases = curve.pedersen_bases(32)
    return PallasMsm(BN254_G1, FQ_LIMBS, bases)


def _affine(curve, pts_nm):
    return curve.to_affine_ints(pts_nm)


def _host_points(n, offset=0):
    """n distinct affine points from the deterministic Pedersen derivation."""
    return [BN254_G1.hash_to_point(b"vimz-tpu-pedersen", offset + i) for i in range(n)]


def _to_lm(curve, affine_list):
    """Affine/None list -> limb-major (16, N) dict."""
    nm = curve.from_affine_ints(affine_list)
    return {k: jnp.swapaxes(v, 0, 1) for k, v in nm.items()}


def _from_lm(curve, lm):
    nm = {k: jnp.swapaxes(v, 0, 1) for k, v in lm.items()}
    return curve.to_affine_ints(nm)


def test_pallas_add_matches_reference(curve, engine):
    """add on random pairs + infinity + doubling + inverse pairs."""
    pc = engine.pc
    pts = _host_points(5)
    neg = (pts[2][0], BN254_G1.p - pts[2][1])
    lhs = [pts[0], pts[1], None, pts[3], pts[2], None]
    rhs = [pts[1], pts[1], pts[2], None, neg, None]
    want = [BN254_G1.add(a, b) for a, b in zip(lhs, rhs)]

    got = _from_lm(curve, pc.add(_to_lm(curve, lhs), _to_lm(curve, rhs)))
    assert got == want


def test_pallas_double_matches_reference(curve, engine):
    pc = engine.pc
    pts = _host_points(3, offset=5)
    ins = pts + [None]
    want = [BN254_G1.add(p, p) for p in ins]
    got = _from_lm(curve, pc.double(_to_lm(curve, ins)))
    assert got == want


def test_pallas_masked_sum_matches_reference(curve, engine):
    """Subset sums incl. all-zero and all-one masks over the 32 bases."""
    N = 8  # masked_sum pads to pow2 and runs log2 halving levels
    bases_aff = _host_points(N)
    small = PallasMsm(BN254_G1, FQ_LIMBS, curve.pedersen_bases(N))
    rng = np.random.default_rng(0)
    masks = np.zeros((4, N), dtype=np.uint32)
    masks[1] = 1
    masks[2] = rng.integers(0, 2, N)
    masks[3, 0] = 1
    got = _affine(curve, small.masked_sum(jnp.asarray(masks)))
    for m, g in zip(masks, got):
        want = None
        for bit, P in zip(m, bases_aff):
            if bit:
                want = BN254_G1.add(want, P)
        assert g == want


def test_pallas_msm_many_matches_reference(curve, engine):
    """Full Pippenger pipeline vs the exact host MSM on adversarial scalars:
    duplicate-heavy values (dedup path), zeros, ones, p-1, full-width."""
    N = 32
    bases_aff = _host_points(N)
    rng = np.random.default_rng(1)

    vals = np.zeros((2, N), dtype=object)
    # instance 0: duplicate-heavy small pool (the real cross-term shape)
    pool = np.array([0, 1, 2, 255, P_FR - 1], dtype=object)
    vals[0] = pool[rng.integers(0, 5, N)]
    # instance 1: random full-width scalars
    chunks = rng.integers(0, 1 << 62, size=(N, 5))
    acc = np.zeros(N, dtype=object)
    for j in range(5):
        acc = (acc << 62) + chunks[:, j].astype(object)
    vals[1] = acc % P_FR

    sc = jnp.asarray(FR_LIMBS.to_limbs(vals))
    got = _affine(curve, engine.msm_many(sc))
    for b in range(2):
        want = BN254_G1.msm([int(v) for v in vals[b]], bases_aff)
        assert got[b] == want


@pytest.fixture(scope="module")
def table_engine(curve):
    from vimz_tpu.curves.table_msm import PallasTableMsm

    return PallasTableMsm(BN254_G1, FQ_LIMBS, curve.pedersen_bases(32))


def test_table_msm_matches_reference(curve, table_engine):
    """Subset-table MSM vs the exact host MSM on the same adversarial
    scalar classes as the Pippenger engine (duplicates cost nothing here —
    the shapes are input-independent by construction)."""
    N = 32
    bases_aff = _host_points(N)
    rng = np.random.default_rng(4)
    vals = np.zeros((2, N), dtype=object)
    pool = np.array([0, 1, 2, 255, P_FR - 1], dtype=object)
    vals[0] = pool[rng.integers(0, 5, N)]
    chunks = rng.integers(0, 1 << 62, size=(N, 5))
    acc = np.zeros(N, dtype=object)
    for j in range(5):
        acc = (acc << 62) + chunks[:, j].astype(object)
    vals[1] = acc % P_FR
    sc = jnp.asarray(FR_LIMBS.to_limbs(vals))
    got = _affine(curve, table_engine.msm_many(sc))
    for b in range(2):
        want = BN254_G1.msm([int(v) for v in vals[b]], bases_aff)
        assert got[b] == want


def test_table_masked_sum_matches_reference(curve, table_engine):
    N = 32
    bases_aff = _host_points(N)
    rng = np.random.default_rng(5)
    masks = np.zeros((3, N), dtype=np.uint32)
    masks[1] = 1
    masks[2] = rng.integers(0, 2, N)
    got = _affine(curve, table_engine.masked_sum(jnp.asarray(masks)))
    for m, g in zip(masks, got):
        want = None
        for bit, P in zip(m, bases_aff):
            if bit:
                want = BN254_G1.add(want, P)
        assert g == want


def test_pallas_msm_matches_xla_msm(curve, engine):
    """PallasMsm == BatchedCurve.msm_many on identical inputs (the two
    engines must be interchangeable: proofs are bit-identical whichever
    commitment path ran)."""
    N = 32
    bases = curve.pedersen_bases(N)
    rng = np.random.default_rng(2)
    vals = np.zeros((2, N), dtype=object)
    vals[0] = rng.integers(0, 1 << 30, N)
    vals[1, :16] = 1  # all-equal run exercising both dedup implementations
    sc = jnp.asarray(FR_LIMBS.to_limbs(vals))
    got = _affine(curve, engine.msm_many(sc))
    want = _affine(curve, curve.msm_many(sc, bases))
    assert got == want
