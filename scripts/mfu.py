#!/usr/bin/env python3
"""MFU / speed-of-light accounting for the prover's hot kernels
(BASELINE.md requirement; VERDICT r4 item 5).

Two layers:

1. RAW RATES — microbenchmarks of the primitive op classes the limb
   arithmetic is built from (u32 multiply / add / shift, fp32 FMA, int8 and
   bf16 MXU matmul), each as a Pallas kernel doing ITERS dependent ops per
   element so memory traffic is negligible. These establish the chip's
   achievable ceiling for each candidate bignum representation.

2. KERNEL SoL — the three hot production kernels (Pallas EC add, Pallas
   masked_sum, Pallas MSM walk via msm_many; XLA limb mul_acc matvec),
   timed warm at bench shapes, with an op-count model giving achieved
   u32-op/s and the ratio to the measured raw ceiling (the kernel's
   speed-of-light fraction).

Timings force host materialization (np.asarray) — block_until_ready is
unreliable over the axon tunnel.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

ROWS, COLS = 1024, 2048  # 2M lanes total
BLK = 64  # grid block rows: (64, 2048) u32 = 512 KB per operand in VMEM
ITERS = 4096  # dependent ops per element: 8 unrolled x 512 fori rounds


def mat(x):
    """Synchronize on completion WITHOUT transferring the result: device->
    host transfers ride the axon HTTP tunnel at ~40-150 MB/s, so
    materializing a multi-MB output would dominate any timing. A 1-element
    derived slice has a data dependency on the whole computation."""
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "ravel"):
            np.asarray(l.ravel()[:1])
        else:
            np.asarray(l)
    return x


def timed(fn, *args, reps=3):
    """Async-dispatch reps back-to-back, sync once at the end — a per-call
    sync would put the ~24 ms tunnel round trip inside every measurement."""
    mat(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    mat(out)
    return (time.time() - t0) / reps, out


def _loop_kernel(body_op, dtype):
    """Kernel: ITERS dependent elementwise ops per element, gridded."""
    from jax import lax

    def kernel(x_ref, y_ref, o_ref):
        y = y_ref[:]

        def body(_, x):
            for _ in range(8):
                x = body_op(x, y)
            return x

        o_ref[:] = lax.fori_loop(0, ITERS // 8, body, x_ref[:])

    spec = pl.BlockSpec((BLK, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            grid=(ROWS // BLK,),
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), dtype),
        )(x, y)

    return run


def raw_rates():
    print("== raw per-op rates (Pallas, compute-bound loops) ==", flush=True)
    res = {}
    rng = np.random.default_rng(0)

    xu = jnp.asarray(rng.integers(1, 1 << 16, (ROWS, COLS), dtype=np.uint32))
    yu = jnp.asarray(rng.integers(1, 1 << 16, (ROWS, COLS), dtype=np.uint32))
    xf = jnp.asarray(rng.random((ROWS, COLS), dtype=np.float32))
    yf = jnp.asarray(rng.random((ROWS, COLS), dtype=np.float32) + 0.5)

    cases = [
        ("u32_mul", _loop_kernel(lambda x, y: x * y, jnp.uint32), xu, yu, 1),
        ("u32_add", _loop_kernel(lambda x, y: x + y, jnp.uint32), xu, yu, 1),
        ("u32_mask_shift",
         _loop_kernel(lambda x, y: (x & jnp.uint32(0xFFFF)) + (y >> 16), jnp.uint32),
         xu, yu, 3),
        ("u32_mul_add", _loop_kernel(lambda x, y: x * y + x, jnp.uint32), xu, yu, 2),
        ("f32_fma", _loop_kernel(lambda x, y: x * y + x, jnp.float32), xf, yf, 2),
        ("f32_mul", _loop_kernel(lambda x, y: x * y, jnp.float32), xf, yf, 1),
        ("f32_floor_scale",
         _loop_kernel(lambda x, y: jnp.floor(x * 0.001953125) + y, jnp.float32),
         xf, yf, 3),
    ]
    for name, fn, x, y, ops_per in cases:
        dt, _ = timed(fn, x, y)
        rate = ROWS * COLS * ITERS * ops_per / dt / 1e9
        res[name] = rate
        print(f"  {name:18s} {rate:10.1f} Gop/s", flush=True)

    # MXU matmul rates (jnp.dot under jit, large square)
    for name, dt_in, acc in (
        ("mxu_int8", jnp.int8, jnp.int32),
        ("mxu_bf16", jnp.bfloat16, jnp.float32),
        ("mxu_f32", jnp.float32, jnp.float32),
    ):
        n = 8192
        a = jnp.asarray(rng.integers(-100, 100, (n, n)), dtype=dt_in)
        b = jnp.asarray(rng.integers(-100, 100, (n, n)), dtype=dt_in)
        f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=acc))
        dt, _ = timed(f, a, b, reps=8)
        rate = 2 * n**3 / dt / 1e12
        res[name] = rate
        print(f"  {name:18s} {rate:10.2f} Top/s", flush=True)
    return res


# op-count model for one RCB complete EC add on 16x16-bit limbs:
#   12 field muls + ~17 add/sub.  field mul = 256 u32 muls + ~512 u32
#   adds/shifts (column build) + REDC (2 more 16x16 passes + carries)
#   ~ 3*256 muls + ~2400 aux -> ~3.2k "u32 ops" counting mul=1.
EC_ADD_OPS = 12 * (3 * 256 + 2400) + 17 * 700  # ~ 50k u32-op equivalents
FIELD_MUL_OPS = 3 * 256 + 2400


def kernel_sol(raw):
    print("== production kernels: achieved rate vs raw ceiling ==", flush=True)
    from vimz_tpu.curves import bn254_batched
    from vimz_tpu.curves.curve import BN254_G1
    from vimz_tpu.curves.pallas_msm import PallasMsm
    from vimz_tpu.fields.limbs import FQ_LIMBS, FR_LIMBS
    from vimz_tpu.fields.pallas_ew import pallas_ew
    from vimz_tpu.fields.prime import P_FR

    curve = bn254_batched()
    rng = np.random.default_rng(1)

    N = 153224  # grayscale constraint count (bench shape)
    B = 16
    bases = curve.pedersen_bases(N)
    eng = PallasMsm(BN254_G1, FQ_LIMBS, bases)

    # 1) Pallas EC add at full lane width
    L = 1 << 20
    pts = eng._infinity3(1, L)
    one = {k: v[:, :, :L] for k, v in pts.items()}
    dt, _ = timed(lambda: eng._add3(one, one))
    rate = L * EC_ADD_OPS / dt / 1e9
    print(f"  pallas_ec_add       {L/dt/1e6:8.2f} M adds/s  "
          f"~{rate:7.1f} Gop/s  ({100*rate/raw['u32_mul']:.0f}% of u32_mul raw)",
          flush=True)

    # 2) masked_sum at leaf-commit shape
    nbit = 131072
    small = PallasMsm(BN254_G1, FQ_LIMBS, curve.pedersen_bases(nbit))
    mask = jnp.asarray(rng.integers(0, 2, (32, nbit), dtype=np.uint32))
    dt, _ = timed(lambda: small.masked_sum(mask))
    adds = 32 * nbit  # halving tree total
    print(f"  masked_sum(32x128k) {dt:8.2f} s       "
          f"{adds/dt/1e6:8.2f} M adds/s", flush=True)

    # 3) full Pippenger msm_many at cross-term shape
    vals = np.zeros((B, N), dtype=object)
    chunks = rng.integers(0, 1 << 62, size=(B, N, 5))
    acc = np.zeros((B, N), dtype=object)
    for j in range(5):
        acc = (acc << 62) + chunks[:, :, j].astype(object)
    vals = acc % P_FR
    sc = jnp.asarray(FR_LIMBS.to_limbs(vals))
    dt, _ = timed(lambda: eng.msm_many(sc), reps=1)
    useful = B * N * (256 // 8 + 12)  # walk adds + dedup scan levels
    print(f"  msm_many(16x153k)   {dt:8.2f} s       "
          f"{useful/dt/1e6:8.2f} M adds/s ({B/dt:.2f} MSM/s)", flush=True)

    # 4) pallas_ew from_mont at witness shape
    ew = pallas_ew(FR_LIMBS)
    w = jnp.asarray(rng.integers(0, 1 << 16, (64, N, 16), dtype=np.uint32))
    dt, _ = timed(lambda: ew.from_mont(w))
    els = 64 * N
    print(f"  ew_from_mont(64xN)  {dt:8.2f} s       "
          f"{els*FIELD_MUL_OPS/dt/1e9:8.1f} Gop/s  "
          f"({els*16*4*2/dt/1e9:.0f} GB/s io)", flush=True)

    # 5) XLA limb from_mont (the path being replaced) for comparison —
    # 16-row shape: the full 64-row jit OOMs HBM (the blow-up pallas_ew fixes)
    dt, _ = timed(jax.jit(lambda x: FR_LIMBS.from_mont(x)), w[:16])
    print(f"  xla_from_mont(16xN) {dt:8.2f} s       (XLA limb path)", flush=True)


def main():
    print(f"platform={jax.default_backend()}", flush=True)
    raw = raw_rates()
    kernel_sol(raw)
    print("MFU DONE", flush=True)


if __name__ == "__main__":
    main()
