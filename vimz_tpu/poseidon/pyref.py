"""Pure-Python Poseidon reference implementation (scalar, exact).

Used for one-off constant derivation (e.g. the redacted-block hash) and as a
test oracle for the batched kernels."""

from vimz_tpu.poseidon.params import PoseidonParams, arkworks_params, circomlib_params


def permute(params: PoseidonParams, state: list[int]) -> list[int]:
    p, t = params.p, params.t
    rf, rp = params.full_rounds, params.partial_rounds
    half = rf // 2
    for r in range(rf + rp):
        state = [(s + params.ark[r][i]) % p for i, s in enumerate(state)]
        if r < half or r >= half + rp:
            state = [pow(s, 5, p) for s in state]
        else:
            state[0] = pow(state[0], 5, p)
        state = [
            sum(params.mds[i][j] * state[j] for j in range(t)) % p for i in range(t)
        ]
    return state


def circom_poseidon(inputs: list[int]) -> int:
    params = circomlib_params(len(inputs))
    return permute(params, [0] + list(inputs))[0]


def ark_sponge_hash(inputs: list[int]) -> int:
    """arkworks PoseidonSponge CRH::evaluate with the rate-16 config."""
    params = arkworks_params()
    rate, cap = params.rate, params.capacity
    state = [0] * params.t
    pos = 0
    remaining = list(inputs)
    while remaining:
        take = min(rate - pos, len(remaining))
        for i in range(take):
            state[cap + pos + i] = (state[cap + pos + i] + remaining[i]) % params.p
        remaining = remaining[take:]
        pos += take
        if pos == rate and remaining:
            state = permute(params, state)
            pos = 0
    state = permute(params, state)
    return state[cap]


def ark_two_to_one(left: int, right: int) -> int:
    return ark_sponge_hash([left, right])


def circom_array_hash(words: list[int]) -> int:
    """circom ArrayHasher window-8 fold (with the reference's numRounds quirk)."""
    L = len(words)
    num_rounds = (L + 7) // 8
    first = min(L, 8)
    h = circom_poseidon(words[:first])
    processed = first
    for _ in range(num_rounds - 1):
        size = min(L - processed, 7)
        h = circom_poseidon([h] + words[processed : processed + size])
        processed += size
    return h
