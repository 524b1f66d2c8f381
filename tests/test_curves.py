"""Curve arithmetic: batched projective ops vs the Python-int reference."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from vimz_tpu.curves import BN254_G1, GRUMPKIN, bn254_batched, grumpkin_batched
from vimz_tpu.fields.limbs import int_to_limbs


def rand_points(curve, n, seed):
    rng = random.Random(seed)
    return [curve.mul(rng.randrange(1, curve.order), curve.gen) for _ in range(n)]


def test_ref_curves_sane():
    for curve in (BN254_G1, GRUMPKIN):
        assert curve.is_on_curve(curve.gen)
        assert curve.mul(curve.order, curve.gen) is None
        P = curve.mul(12345, curve.gen)
        assert curve.is_on_curve(P)


@pytest.mark.parametrize("make", [bn254_batched, grumpkin_batched], ids=["bn254", "grumpkin"])
def test_batched_add_double(make):
    bc = make()
    curve = bc.ref
    pts = rand_points(curve, 6, 1) + [None]
    qts = rand_points(curve, 6, 2) + [None]
    # include P + P and P + (-P) cases
    pts.append(pts[0])
    qts.append(pts[0])
    negp = (pts[1][0], (-pts[1][1]) % curve.p)
    pts.append(pts[1])
    qts.append(negp)

    P = bc.from_affine_ints(pts)
    Q = bc.from_affine_ints(qts)
    got = bc.to_affine_ints(bc.add(P, Q))
    want = [curve.add(p, q) for p, q in zip(pts, qts)]
    assert got == want

    got_dbl = bc.to_affine_ints(bc.double(P))
    want_dbl = [curve.add(p, p) for p in pts]
    assert got_dbl == want_dbl


def test_batched_scalar_mul():
    bc = bn254_batched()
    curve = bc.ref
    rng = random.Random(3)
    scalars = [0, 1, 2, rng.randrange(curve.order), curve.order - 1]
    base = [curve.gen] * len(scalars)
    P = bc.from_affine_ints(base)
    s = jnp.asarray(np.stack([int_to_limbs(x) for x in scalars]))
    got = bc.to_affine_ints(bc.scalar_mul(s, P))
    want = [curve.mul(x, curve.gen) for x in scalars]
    assert got == want


@pytest.mark.parametrize("c", [8])
def test_msm_matches_reference(c):
    bc = bn254_batched()
    curve = bc.ref
    rng = random.Random(c)
    n = 33
    pts = rand_points(curve, n, 4)
    scalars = [rng.randrange(curve.order) for _ in range(n - 2)] + [0, 1]
    P = bc.from_affine_ints(pts)
    s = jnp.asarray(np.stack([int_to_limbs(x) for x in scalars]))
    got = bc.to_affine_ints(bc.msm(s, P, c))[0]
    want = curve.msm(scalars, pts)
    assert got == want


def test_pedersen_bases_deterministic_and_valid():
    bc = bn254_batched()
    bases = bc.to_affine_ints(bc.pedersen_bases(5))
    bases2 = bc.to_affine_ints(bc.pedersen_bases(5))
    assert bases == bases2
    for P in bases:
        assert P is not None and bc.ref.is_on_curve(P)
    assert len({P for P in bases}) == 5
