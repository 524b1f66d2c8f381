#!/usr/bin/env python3
"""4K memory-plan smoke (VERDICT r4 item 9).

Validates the _RowStore chunk-subtree streaming claim beyond HD without a
full prove: synthesize a 4K-width grayscale circuit (3840 px rows, 2160
fold steps), check the prover's chunk plan against the chip's HBM, run ONE
leaf chunk end-to-end (witness tape -> commitments -> fold to chunk root)
on the real device, and report peak HBM from the device allocator.

Reference point: the reference proves 8K images in 10 GB RAM by streaming
one row at a time (/root/reference/README.md:24); this framework streams
64-step chunk subtrees.
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.editor.ops import pack_words_rows
from vimz_tpu.folding import FoldingProver
from vimz_tpu.folding.nova import _RowStore
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.folding.transcript import instance_digests_batch
from vimz_tpu.pipeline.input import Resolution, Transformation, VIMzInput

STEPS = int(os.environ.get("VIMZ_4K_STEPS", "64"))  # one leaf chunk

print(f"platform={jax.default_backend()}", flush=True)
rng = np.random.default_rng(0)
W4K = 3840
img = rng.integers(0, 256, (STEPS, W4K, 3), dtype=np.uint8)
inp = VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})

t0 = time.time()
r1cs = synthesize(Transformation.GRAYSCALE, inp, resolution=Resolution.R4K)
print(f"synthesize(4K x {STEPS}) in {time.time()-t0:.1f}s: "
      f"{r1cs.n_constraints} constraints, {r1cs.n_wires} wires", flush=True)

t0 = time.time()
d = DeviceR1CS(r1cs)
prover = FoldingProver(d)
print(f"setup in {time.time()-t0:.1f}s; PAIR_CHUNK={prover.PAIR_CHUNK}", flush=True)

# chunk-plan assertion: one chunk's live set must fit a 16 GB chip
CS = prover.LEAF_CHUNK or max(64, 2 * prover.PAIR_CHUNK)
z_bytes = CS * (d.n_wires + 1) * 16 * 4
e_bytes = CS * d.n_constraints * 16 * 4
tables = 3 * 3 * 16 * 4 * (d.n_constraints // 8) * 256  # three subset tables
plan = z_bytes + e_bytes // 2 + tables
print(f"chunk plan: CS={CS}, z={z_bytes/1e9:.2f} GB, e/2={e_bytes/2e9:.2f} GB, "
      f"tables={tables/1e9:.2f} GB, total={plan/1e9:.2f} GB", flush=True)
assert plan < 14e9, "4K chunk plan exceeds a 16 GB chip"

# run one leaf chunk: witness -> commitments -> fold subtree to its root
from vimz_tpu.r1cs.witness import execute_tape

t0 = time.time()
S = min(CS, r1cs.S)
z_c = execute_tape(r1cs, 0, S)
w_std = prover._from_mont_rows(z_c[:, 1 + d.n_pub : d.n_wires])
comm_w = prover.commit_witnesses(w_std)
comm_aff = prover.to_affine(comm_w)
print(f"leaf chunk ({S} steps) witnessed+committed in {time.time()-t0:.1f}s",
      flush=True)

t0 = time.time()
x_all = r1cs.inputs[:, : d.n_pub].copy()
prover._hiding = False
prover._blind_rng = None
state = dict(
    z_store=_RowStore([z_c]), e_store=None,
    cw_maps=[{i: 1} for i in range(S)], ce_maps=[{} for _ in range(S)],
    u=[1] * S, x=x_all[:S].copy(),
    r_w=[0] * S, r_e=[0] * S,
    digests=instance_digests_batch([1] * S, x_all[:S], comm_aff, [None] * S),
)
root = prover._fold_to_root(state, {}, 0)
np.asarray(root["z"].ravel()[:1])
print(f"chunk folded to root in {time.time()-t0:.1f}s", flush=True)

# peak HBM from the device allocator
try:
    stats = jax.local_devices()[0].memory_stats()
    peak = stats.get("peak_bytes_in_use", 0)
    print(f"peak HBM: {peak/1e9:.2f} GB (limit {stats.get('bytes_limit', 0)/1e9:.1f} GB)",
          flush=True)
except Exception as e:  # axon may not expose memory_stats
    print(f"memory_stats unavailable: {e}", flush=True)
print("4K SMOKE OK", flush=True)
