#!/usr/bin/env python3
"""Stage-by-stage fold-path smoke test for the real TPU.

Runs each hot-path stage (witness tape, leaf commit, cross term, T MSM,
to_affine) in isolation with wall timings, so a TPU-side failure (OOM,
kernel fault, pathological compile) is attributed to one kernel instead of
surfacing at the first blocking device->host transfer of a full prove.

Usage: python scripts/bisect_fold.py [steps] [transformation]
Env:   VIMZ_PAIR_CHUNK to pin the pair batch size.
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

import numpy as np
import jax.numpy as jnp

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.editor.ops import pack_words_rows
from vimz_tpu.fields.limbs import FR_LIMBS as f
from vimz_tpu.folding.nova import FoldingProver, _index_points
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.pipeline.input import Transformation, VIMzInput
from vimz_tpu.r1cs.witness import execute_tape


def stage(name):
    t0 = time.time()

    def done(x=None):
        if x is not None:
            jax.block_until_ready(x)
        print(f"  [{name}] ok in {time.time() - t0:.1f}s", flush=True)

    return done


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (steps, 1280, 3), dtype=np.uint8)
    inp = VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})

    d0 = stage("synthesize")
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    d0()
    print(f"  {r1cs.n_constraints} constraints, {r1cs.n_wires} wires", flush=True)

    d0 = stage("setup")
    d = DeviceR1CS(r1cs)
    pr = FoldingProver(d)
    d0()
    B = pr.PAIR_CHUNK
    print(f"  PAIR_CHUNK={B} MSM_CHUNK={pr.MSM_CHUNK}", flush=True)

    d0 = stage("tape")
    z = execute_tape(r1cs, 0, steps)
    d0(z)

    d0 = stage("from_mont")
    w_std = pr._from_mont_rows(z[:, 1 + d.n_pub : d.n_wires])
    d0(w_std)

    d0 = stage("leaf_commit")
    cw = pr.commit_witnesses(w_std)
    d0(cw["x"])

    d0 = stage("leaf_to_affine")
    aff = pr.to_affine(cw)
    d0()

    z1, z2 = z[0::2], z[1::2]
    pad = B - z1.shape[0]
    if pad > 0:
        zp = jnp.zeros((pad,) + z1.shape[1:], z1.dtype)
        z1 = jnp.concatenate([z1, zp])
        z2 = jnp.concatenate([z2[: z1.shape[0]], zp])[: z1.shape[0]]
    z1, z2 = z1[:B], z2[:B]
    u = jnp.asarray(f.to_limbs_mont(np.ones(B, dtype=object)))

    d0 = stage("cross_term_compile+run")
    T = d.cross_term(z1, u, z2, u)
    d0(T)

    d0 = stage("cross_term_warm")
    T2 = d.cross_term(z1, u, z2, u)
    d0(T2)

    d0 = stage("T_from_mont")
    Ts = pr._from_mont_rows(T)
    d0(Ts)

    bases_c = _index_points(pr.bases, slice(0, d.n_constraints))
    d0 = stage("T_msm")
    ct = pr._msm_chunked(Ts, bases_c, min(pr.MSM_CHUNK, B))
    d0(ct["x"])

    d0 = stage("T_msm_warm")
    ct2 = pr._msm_chunked(Ts, bases_c, min(pr.MSM_CHUNK, B))
    d0(ct2["x"])

    d0 = stage("T_to_affine")
    aff = pr.to_affine(ct)
    d0()
    print("ALL STAGES OK", flush=True)


if __name__ == "__main__":
    main()
