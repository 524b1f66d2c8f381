#!/usr/bin/env python3
"""Pinpoint the leaf-commitment mismatch: compare every stage of
commit_witnesses (bit masked_sum, full msm, combine) against the exact
host Pippenger on the real witness of a small circuit."""

import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("VIMZ_HIDING", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.editor.ops import pack_words_rows
from vimz_tpu.folding import FoldingProver
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.fields.limbs import FR_LIMBS as f
from vimz_tpu.pipeline.input import Transformation, VIMzInput
from vimz_tpu.r1cs.witness import execute_tape

rng = np.random.default_rng(0)
img = rng.integers(0, 256, (16, 60, 3), dtype=np.uint8)
inp = VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})
r1cs = synthesize(Transformation.GRAYSCALE, inp)
d = DeviceR1CS(r1cs)
prover = FoldingProver(d)
print(f"bit={len(prover._bit_idx)} full={len(prover._full_idx)} "
      f"n_wit={prover.n_wit}", flush=True)

B = 4
z = execute_tape(r1cs, 0, B)
w_std = prover._from_mont_rows(z[:, 1 + d.n_pub : d.n_wires])
vals = f.from_limbs(np.asarray(w_std))  # (B, n_wit) ints

ref = prover.curve.ref
base_aff = prover._base_affine(prover.n_wit)

# host ground truth
want_full = [ref.msm_pippenger(vals[i], base_aff) for i in range(B)]

# 0) sanity: witness ints in range + bit wires are bits
assert all(0 <= int(v) < f.p for v in vals.ravel()[:100])
bw = vals[:, prover._bit_idx]
assert set(np.unique(bw.astype(int))) <= {0, 1}, "non-bit values in bit wires"
print("bit wires are 0/1 OK", flush=True)

bit_e, full_e = prover._pallas_leaf_engines()
print(f"engines: bit={type(bit_e).__name__} full={type(full_e).__name__}",
      flush=True)

# 1) bit part
bit_scalars = jnp.asarray(w_std[:, prover._bit_idx, 0])
pad = jnp.zeros((prover.MSM_CHUNK - B, bit_scalars.shape[1]), jnp.uint32)
got_bit = prover.to_affine(bit_e.masked_sum(jnp.concatenate([bit_scalars, pad])))[:B]
want_bit = []
for i in range(B):
    want_bit.append(ref.msm_pippenger(
        [int(v) for v in bw[i]], [base_aff[j] for j in prover._bit_idx]))
print("bit part:", ["OK" if g == w else "MISMATCH"
                    for g, w in zip(got_bit, want_bit)], flush=True)

# 2) full part
if full_e is not None:
    fsc = jnp.asarray(np.asarray(w_std)[:, prover._full_idx])
    padf = jnp.zeros((prover.MSM_CHUNK - B,) + fsc.shape[1:], jnp.uint32)
    got_full = prover.to_affine(full_e.msm_many(jnp.concatenate([fsc, padf])))[:B]
    fv = vals[:, prover._full_idx]
    want_f = [ref.msm_pippenger([int(v) for v in fv[i]],
                                [base_aff[j] for j in prover._full_idx])
              for i in range(B)]
    print("full part:", ["OK" if g == w else "MISMATCH"
                         for g, w in zip(got_full, want_f)], flush=True)

# 3) whole commit_witnesses
got = prover.to_affine(prover.commit_witnesses(w_std))[:B]
print("combined:", ["OK" if g == w else "MISMATCH"
                    for g, w in zip(got, want_full)], flush=True)
print("DONE", flush=True)
