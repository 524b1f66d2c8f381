#!/usr/bin/env python3
"""TPU smoke + timing for the subset-table MSM engine at bench shapes.

Correctness oracle: sparse scalars (k nonzero) checked against the exact
host curve; timing at the real comm_T shape (B x n_constraints).
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

from vimz_tpu.curves import bn254_batched
from vimz_tpu.curves.curve import BN254_G1
from vimz_tpu.curves.table_msm import PallasTableMsm
from vimz_tpu.fields.limbs import FQ_LIMBS, FR_LIMBS
from vimz_tpu.fields.prime import P_FR

N = int(sys.argv[1]) if len(sys.argv) > 1 else 153224
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

curve = bn254_batched()
print(f"platform={jax.default_backend()} N={N} B={B}", flush=True)

t0 = time.time()
bases = curve.pedersen_bases(N)
print(f"bases loaded in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
eng = PallasTableMsm(BN254_G1, FQ_LIMBS, bases)
np.asarray(eng.table["x"].ravel()[:1])
print(f"table built in {time.time()-t0:.1f}s (G={eng.G}, G2={eng.G2})", flush=True)

# correctness: k-sparse scalars (host-checkable)
rng = np.random.default_rng(0)
k = 24
vals = np.zeros((2, N), dtype=object)
pos = [rng.choice(N, k, replace=False) for _ in range(2)]
for b in range(2):
    chunks = rng.integers(0, 1 << 62, size=(k, 5))
    acc = np.zeros(k, dtype=object)
    for j in range(5):
        acc = (acc << 62) + chunks[:, j].astype(object)
    vals[b, pos[b]] = acc % P_FR
# adversarial: duplicate-heavy values in instance 0
vals[0, pos[0][: k // 2]] = vals[0, pos[0][0]]

sc = jnp.asarray(FR_LIMBS.to_limbs(vals))
t0 = time.time()
got_pts = eng.msm_many(sc)
got = curve.to_affine_ints(got_pts)
print(f"sparse msm_many cold in {time.time()-t0:.1f}s", flush=True)
for b in range(2):
    aff = [BN254_G1.hash_to_point(b"vimz-tpu-pedersen", int(i)) for i in pos[b]]
    want = BN254_G1.msm([int(vals[b, i]) for i in pos[b]], aff)
    assert got[b] == want, f"instance {b} MISMATCH"
print("sparse correctness OK", flush=True)

# masked_sum correctness
mask = np.zeros((2, N), dtype=np.uint32)
mpos = rng.choice(N, 40, replace=False)
mask[0, mpos] = 1
t0 = time.time()
gm = curve.to_affine_ints(eng.masked_sum(jnp.asarray(mask)))
print(f"masked_sum cold in {time.time()-t0:.1f}s", flush=True)
want = None
for i in sorted(mpos):
    want = BN254_G1.add(want, BN254_G1.hash_to_point(b"vimz-tpu-pedersen", int(i)))
assert gm[0] == want and gm[1] is None, "masked_sum MISMATCH"
print("masked_sum correctness OK", flush=True)

# timing warm at full width (dense random scalars)
dense = np.zeros((B, N), dtype=object)
chunks = rng.integers(0, 1 << 62, size=(B, N, 5))
acc = np.zeros((B, N), dtype=object)
for j in range(5):
    acc = (acc << 62) + chunks[:, :, j].astype(object)
dense = acc % P_FR
scd = jnp.asarray(FR_LIMBS.to_limbs(dense))
out = eng.msm_many(scd)
np.asarray(out["x"].ravel()[:1])
t0 = time.time()
out = eng.msm_many(scd)
np.asarray(out["x"].ravel()[:1])
dt = time.time() - t0
print(f"msm_many({B}x{N}) warm: {dt:.2f}s  ({B/dt:.2f} MSM/s)", flush=True)

msk = jnp.asarray(rng.integers(0, 2, (32, N), dtype=np.uint32))
out = eng.masked_sum(msk)
np.asarray(out["x"].ravel()[:1])
t0 = time.time()
out = eng.masked_sum(msk)
np.asarray(out["x"].ravel()[:1])
print(f"masked_sum(32x{N}) warm: {time.time()-t0:.2f}s", flush=True)
print("SMOKE OK", flush=True)
