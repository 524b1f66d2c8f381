#!/usr/bin/env python3
"""Tiny CPU prove+verify smoke (positive + tamper-negative) — the fastest
full-stack correctness gate after a folding/transcript change.

Usage: python scripts/smoke_cpu_fold.py [h=4] [transformation=grayscale]
"""

import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("VIMZ_PAIR_CHUNK", "8")
os.environ.setdefault("VIMZ_MSM_CHUNK", "8")
os.environ.setdefault("VIMZ_MSM_IMPL", "host")

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache("cpu")

import numpy as np

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.editor.ops import pack_words_rows
from vimz_tpu.folding import FoldingProver, FoldingVerifier
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.pipeline.input import Transformation, VIMzInput

H = int(sys.argv[1]) if len(sys.argv) > 1 else 4

rng = np.random.default_rng(3)
img = rng.integers(0, 256, (H, 20, 3), dtype=np.uint8)
inp = VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})
r1cs = synthesize(Transformation.GRAYSCALE, inp)
d = DeviceR1CS(r1cs)
proof = FoldingProver(d).prove(r1cs)
zn = [int(v) for v in r1cs.witness[-1, 1 + 2 : 1 + 4]]
ok = FoldingVerifier(d).verify(proof, [0, 0], zn)
print("VERIFY:", ok)
assert ok, "honest proof rejected"

import copy

bad = copy.deepcopy(proof)
bad.node_comm_t[0][0] = bad.node_comm_t[0][-1] if len(bad.node_comm_t[0]) > 1 else (
    proof.leaf_comm_w[0]
)
r = FoldingVerifier(d).verify(bad, [0, 0], zn)
print("TAMPER-CT:", r)
assert not r, "tampered cross-term accepted"

bad2 = copy.deepcopy(proof)
bad2.leaf_comm_w[1] = proof.leaf_comm_w[0]
r2 = FoldingVerifier(d).verify(bad2, [0, 0], zn)
print("TAMPER-LEAF:", r2)
assert not r2, "tampered leaf commitment accepted"

if proof.w_final is not None:
    bad3 = copy.deepcopy(proof)
    bad3.w_final[0] = (int(bad3.w_final[0]) + 1) % (2**250)
    r3 = FoldingVerifier(d).verify(bad3, [0, 0], zn)
    print("TAMPER-W:", r3)
    assert not r3, "tampered witness accepted"
print("CPU FOLD SMOKE OK")
