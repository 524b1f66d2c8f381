#!/usr/bin/env python3
"""Bisect the bench-64 verify_ok=False regression on the real TPU.

Stage 1: differential-test every pallas_ew fused kernel against the XLA
limb formulas on random Montgomery inputs (the CPU suite cannot catch a
TPU-lowering bug — ew is gated off on CPU).
Stage 2: a small real prove+verify (16 steps, 64 px wide — wide enough
that the bit-wire count enables the table engines) with
VIMZ_VERIFY_DEBUG=1, under the feature toggles given on the command line.

Usage: python scripts/debug_verify.py [stage2_only]
Env toggles: VIMZ_PALLAS_EW=0, VIMZ_MSM_TABLE=0, VIMZ_HIDING=0
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("VIMZ_VERIFY_DEBUG", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

from vimz_tpu.fields.limbs import FR_LIMBS as f
from vimz_tpu.fields.prime import P_FR as P

print(f"platform={jax.default_backend()} toggles: "
      f"EW={os.environ.get('VIMZ_PALLAS_EW','dflt')} "
      f"TABLE={os.environ.get('VIMZ_MSM_TABLE','dflt')} "
      f"HIDING={os.environ.get('VIMZ_HIDING','dflt')}", flush=True)


def _rand_mont(rng, shape):
    vals = np.zeros(shape, dtype=object)
    flat = vals.reshape(-1)
    ch = rng.integers(0, 1 << 62, size=(flat.shape[0], 5))
    acc = np.zeros(flat.shape[0], dtype=object)
    for j in range(5):
        acc = (acc << 62) + ch[:, j].astype(object)
    flat[:] = acc % P
    return vals, jnp.asarray(f.to_limbs_mont(vals))


def stage1():
    from vimz_tpu.fields.pallas_ew import pallas_ew

    ew = pallas_ew(f)
    rng = np.random.default_rng(0)
    B, n = 4, 700
    a_i, a = _rand_mont(rng, (B, n))
    b_i, b = _rand_mont(rng, (B, n))
    t_i, t = _rand_mont(rng, (B, n))
    r_i, r = _rand_mont(rng, (B, 1))
    r2_i = (r_i * r_i) % P
    r2 = jnp.asarray(f.to_limbs_mont(r2_i))

    def ints(x):
        return f.from_limbs_mont(np.asarray(x))

    checks = [
        ("from_mont", f.from_limbs(np.asarray(ew.from_mont(a))), a_i % P),
        ("mul", ints(ew.mul(a, b)), (a_i * b_i) % P),
        ("add", ints(ew.add(a, b)), (a_i + b_i) % P),
        ("sub", ints(ew.sub(a, b)), (a_i - b_i) % P),
        ("fold_z", ints(ew.fold_z(a, b, r[:, :, :])), (a_i + b_i * r_i) % P),
        ("fold_e", ints(ew.fold_e(a, t, b, r[:, :, :], r2[:, :, :])),
         (a_i + t_i * r_i + b_i * r2_i) % P),
        ("mul_r", ints(ew.mul_r(t, r[:, :, :])), (t_i * r_i) % P),
    ]
    # cross_combine: a1*b2 + a2*b1 - u1*c2 - u2*c1
    u_i, u = _rand_mont(rng, (B, 1))
    v_i, v = _rand_mont(rng, (B, 1))
    c1_i, c1 = _rand_mont(rng, (B, n))
    c2_i, c2 = _rand_mont(rng, (B, n))
    want = (a_i * b_i + t_i * c1_i - u_i * c2_i - v_i * c1_i) % P
    got = ints(ew.cross_combine(a, b, t, c1, c1, c2,
                                u[:, :, :], v[:, :, :]))
    checks.append(("cross_combine", got, want))

    ok = True
    for name, got, want in checks:
        match = np.array_equal(np.asarray(got) % P, np.asarray(want) % P)
        print(f"  ew {name:14s} {'OK' if match else 'MISMATCH'}", flush=True)
        ok = ok and match
    return ok


def stage2():
    from vimz_tpu.circuits import synthesize
    from vimz_tpu.editor import convert_to_grayscale
    from vimz_tpu.editor.ops import pack_words_rows
    from vimz_tpu.folding import FoldingProver, FoldingVerifier
    from vimz_tpu.folding.relaxed import DeviceR1CS
    from vimz_tpu.pipeline.input import Transformation, VIMzInput

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 60, 3), dtype=np.uint8)
    inp = VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})
    t0 = time.time()
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    print(f"  setup {time.time()-t0:.1f}s: {r1cs.n_constraints} constraints, "
          f"bit={len(prover._bit_idx)} full={len(prover._full_idx)} "
          f"PAIR_CHUNK={prover.PAIR_CHUNK}", flush=True)
    t0 = time.time()
    proof = prover.prove(r1cs, progress=True)
    print(f"  prove {time.time()-t0:.1f}s", flush=True)
    zn = [int(v) for v in r1cs.inputs[-1, 2:4]]
    t0 = time.time()
    ok = FoldingVerifier(d).verify(proof, [0, 0], zn)
    print(f"  verify {time.time()-t0:.1f}s -> {ok}", flush=True)
    return ok


if __name__ == "__main__":
    if "stage2_only" not in sys.argv:
        s1 = stage1()
        print(f"STAGE1 {'OK' if s1 else 'FAILED'}", flush=True)
    s2 = stage2()
    print(f"STAGE2 {'OK' if s2 else 'FAILED'}", flush=True)
