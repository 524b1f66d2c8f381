"""Poseidon parameter sets used by the prover.

Two instantiations, matching the two hashing pipelines of the reference:

- `arkworks_params()`: rate 16, capacity 1 (t=17), alpha 5, 8 full + 68
  partial rounds over BN254 Fr — the configuration built by
  `poseidon_config` in the reference
  (vimz/src/sonobe_backend/circuits/arkworks/mod.rs:18-41). Used for image
  commitments and all in-circuit hashing of the flagship (arkworks-frontend)
  pipeline.

- `circomlib_params(n_inputs)`: t = n_inputs+1, alpha 5, 8 full rounds,
  partial rounds from circomlib's N_ROUNDS_P table — the parameterization of
  circomlib's poseidon.circom, used by the reference's circom pipeline and
  the Python image-hasher (pyvimz/pyvimz/image_hasher.py), whose outputs are
  the golden `.hash` fixtures in marketplace/image-data/.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from vimz_tpu.fields.prime import P_FR
from vimz_tpu.poseidon.grain import generate_ark_and_mds

# circomlib partial-round counts, indexed by t-2 (i.e. n_inputs-1).
CIRCOMLIB_N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]


@dataclass(frozen=True)
class PoseidonParams:
    p: int
    t: int
    full_rounds: int
    partial_rounds: int
    alpha: int
    ark: tuple  # (R, t) ints
    mds: tuple  # (t, t) ints, effective orientation: new[i] = sum_j mds[i][j]*s[j]
    rate: int
    capacity: int

    @property
    def rounds(self) -> int:
        return self.full_rounds + self.partial_rounds


@lru_cache(maxsize=None)
def arkworks_params() -> PoseidonParams:
    full_rounds, partial_rounds, rate = 8, 68, 16
    t = rate + 1
    ark, mds = generate_ark_and_mds(P_FR, 254, t, full_rounds, partial_rounds)
    return PoseidonParams(
        p=P_FR,
        t=t,
        full_rounds=full_rounds,
        partial_rounds=partial_rounds,
        alpha=5,
        ark=tuple(tuple(r) for r in ark),
        mds=tuple(tuple(r) for r in mds),
        rate=rate,
        capacity=1,
    )


@lru_cache(maxsize=None)
def circomlib_params(n_inputs: int) -> PoseidonParams:
    assert 1 <= n_inputs <= 16
    t = n_inputs + 1
    full_rounds = 8
    partial_rounds = CIRCOMLIB_N_ROUNDS_P[t - 2]
    # Validated against circomlib known-answer vectors (tests/test_poseidon.py):
    # the effective orientation is the plain Cauchy matrix, same as arkworks.
    ark, mds = generate_ark_and_mds(P_FR, 254, t, full_rounds, partial_rounds)
    return PoseidonParams(
        p=P_FR,
        t=t,
        full_rounds=full_rounds,
        partial_rounds=partial_rounds,
        alpha=5,
        ark=tuple(tuple(r) for r in ark),
        mds=tuple(tuple(r) for r in mds),
        rate=n_inputs,
        capacity=1,
    )
