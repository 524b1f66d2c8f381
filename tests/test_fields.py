"""Differential tests: vectorized limb field vs Python-int reference."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from vimz_tpu.fields import FR, FQ, FR_LIMBS, FQ_LIMBS
from vimz_tpu.fields.limbs import int_to_limbs, limbs_to_int

FIELDS = [(FR, FR_LIMBS), (FQ, FQ_LIMBS)]


def rand_elems(p, n, seed):
    rng = random.Random(seed)
    special = [0, 1, 2, p - 1, p - 2, (1 << 255) % p, (1 << 256) % p]
    return special + [rng.randrange(p) for _ in range(n - len(special))]


def test_limb_roundtrip():
    x = 0x1234_5678_9ABC_DEF0_1122_3344_5566_7788_99AA_BBCC_DDEE_FF00_0102_0304_0506_0708
    assert limbs_to_int(int_to_limbs(x)) == x


@pytest.mark.parametrize("ref,lf", FIELDS, ids=["Fr", "Fq"])
def test_add_sub_neg(ref, lf):
    xs = rand_elems(ref.p, 32, 1)
    ys = rand_elems(ref.p, 32, 2)
    a = jnp.asarray(lf.to_limbs(xs))
    b = jnp.asarray(lf.to_limbs(ys))
    got_add = lf.from_limbs(np.asarray(lf.add(a, b)))
    got_sub = lf.from_limbs(np.asarray(lf.sub(a, b)))
    got_neg = lf.from_limbs(np.asarray(lf.neg(a)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got_add[i] == ref.add(x, y)
        assert got_sub[i] == ref.sub(x, y)
        assert got_neg[i] == ref.neg(x)


@pytest.mark.parametrize("ref,lf", FIELDS, ids=["Fr", "Fq"])
def test_mont_mul(ref, lf):
    xs = rand_elems(ref.p, 32, 3)
    ys = rand_elems(ref.p, 32, 4)
    a = jnp.asarray(lf.to_limbs_mont(xs))
    b = jnp.asarray(lf.to_limbs_mont(ys))
    got = lf.from_limbs_mont(np.asarray(lf.mul(a, b)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got[i] == ref.mul(x, y), f"mul mismatch at {i}"


@pytest.mark.parametrize("ref,lf", FIELDS, ids=["Fr", "Fq"])
def test_mont_form_roundtrip(ref, lf):
    xs = rand_elems(ref.p, 16, 5)
    a = jnp.asarray(lf.to_limbs(xs))
    m = lf.to_mont(a)
    back = lf.from_limbs(np.asarray(lf.from_mont(m)))
    for i, x in enumerate(xs):
        assert back[i] == x


@pytest.mark.parametrize("K", [2, 17, 128, 1024])
def test_mul_acc(K):
    ref, lf = FR, FR_LIMBS
    rng = random.Random(K)
    xs = [[rng.randrange(ref.p) for _ in range(K)] for _ in range(3)]
    ys = [[rng.randrange(ref.p) for _ in range(K)] for _ in range(3)]
    a = jnp.asarray(lf.to_limbs_mont(xs))  # (3, K, 16)
    b = jnp.asarray(lf.to_limbs_mont(ys))
    got = lf.from_limbs_mont(np.asarray(lf.mul_acc(a, b)))
    for i in range(3):
        want = sum(x * y for x, y in zip(xs[i], ys[i])) % ref.p
        assert got[i] == want, f"mul_acc K={K} row {i}"


def test_inv_and_pow():
    ref, lf = FR, FR_LIMBS
    xs = rand_elems(ref.p, 9, 6)
    xs = [x for x in xs if x != 0]
    a = jnp.asarray(lf.to_limbs_mont(xs))
    got = lf.from_limbs_mont(np.asarray(lf.inv(a)))
    for i, x in enumerate(xs):
        assert got[i] == ref.inv(x)
    # inv(0) = 0 convention
    z = jnp.asarray(lf.to_limbs_mont([0]))
    assert lf.from_limbs(np.asarray(lf.inv(z)))[0] == 0


def test_predicates():
    lf = FR_LIMBS
    a = jnp.asarray(lf.to_limbs([0, 1, 5]))
    assert list(np.asarray(lf.is_zero(a))) == [True, False, False]
    b = jnp.asarray(lf.to_limbs([0, 2, 5]))
    assert list(np.asarray(lf.eq(a, b))) == [True, False, True]
