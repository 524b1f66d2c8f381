"""Proof artifacts: JSON serialization and EVM calldata encoding.

Two output formats, mirroring the reference's two backends:

- JSON proof file (nova-snark path writes a serde JSON CompressedSNARK,
  vimz/src/nova_snark_backend/mod.rs:71-79): a versioned hex-field JSON
  document, loadable by `load_proof_json` (no pickle — a proof file is
  attacker-supplied input).

- EVM calldata (sonobe path, vimz/src/sonobe_backend/solidity.rs:13-27):
  `verifyOpaqueNovaProofWithInputs(steps, initState[], finalState[],
  proof[])` ABI-encoded call, parsed back by `ProofData.from_calldata` —
  the analog of the marketplace SDK's parser
  (marketplace/vimz_marketplace_sdk/artifacts.py:20-46). The reference's
  NovaDecider takes a fixed uint256[25]; this framework's decider proof
  (tree commitments + Spartan transcript) is variable-length, so the encoded
  array is dynamic and the generated verifier contracts declare a matching
  signature.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

from vimz_tpu.fields.prime import P_FR as P

SELECTOR = bytes.fromhex("5fca4d99")  # keccak-less stand-in selector (see contract gen)
VERSION = "vimz-tpu-proof-v1"


# ----------------------------------------------------------------------
# word flattening
# ----------------------------------------------------------------------


def _point_words(pt) -> list[int]:
    return [0, 0] if pt is None else [int(pt[0]), int(pt[1])]


def proof_to_words(proof) -> list[int]:
    """Flatten a FoldProof (compressed or not) into uint256 words."""
    words: list[int] = [proof.steps, proof.state_len]
    words.append(len(proof.leaf_comm_w))
    for pt in proof.leaf_comm_w:
        words += _point_words(pt)
    words.append(len(proof.node_comm_t))
    for level in proof.node_comm_t:
        words.append(len(level))
        for pt in level:
            words += _point_words(pt)
    words += [int(v) % P for row in proof.x_rows for v in row]
    words.append(int(proof.u_final))
    if proof.spartan is not None:
        sp = proof.spartan
        words.append(1)
        for rounds in (sp.sc1_rounds, sp.sc2_rounds):
            words.append(len(rounds))
            for msg in rounds:
                words.append(len(msg))
                words += [int(v) for v in msg]
        words += [sp.vA, sp.vB, sp.vC, sp.vE, sp.vZ]
        for ipa in (sp.ipa_w, sp.ipa_e):
            words.append(len(ipa.L))
            for pt in ipa.L:
                words += _point_words(pt)
            for pt in ipa.R:
                words += _point_words(pt)
            words.append(int(ipa.a_final))
    else:
        words.append(0)
        words.append(len(proof.w_final))
        words += [int(v) for v in proof.w_final]
        words.append(len(proof.e_final))
        words += [int(v) for v in proof.e_final]
    return words


class _WordReader:
    def __init__(self, words):
        self.w = list(words)
        self.i = 0

    def take(self, n: int = 1):
        out = self.w[self.i : self.i + n]
        if len(out) != n:
            raise ValueError("truncated proof words")
        self.i += n
        return out if n > 1 else out[0]

    def point(self):
        x, y = self.take(2)
        return None if (x == 0 and y == 0) else (x, y)


def words_to_proof(words: list[int]):
    """Inverse of proof_to_words -> FoldProof."""
    from vimz_tpu.folding.nova import FoldProof
    from vimz_tpu.snark.ipa import IPAProof
    from vimz_tpu.snark.spartan import SpartanProof

    r = _WordReader(words)
    steps, state_len = r.take(2)
    n_leaf = r.take()
    leaf = [r.point() for _ in range(n_leaf)]
    n_levels = r.take()
    node_comm_t = []
    for _ in range(n_levels):
        n = r.take()
        node_comm_t.append([r.point() for _ in range(n)])
    x_rows = np.array(
        [[r.take() for _ in range(2 * state_len)] for _ in range(steps)],
        dtype=object,
    ).reshape(steps, 2 * state_len)
    u_final = r.take()
    has_spartan = r.take()
    if has_spartan:
        scs = []
        for _ in range(2):
            n = r.take()
            rounds = []
            for _ in range(n):
                k = r.take()
                msg = r.take(k)
                rounds.append(msg if isinstance(msg, list) else [msg])
            scs.append(rounds)
        vA, vB, vC, vE, vZ = r.take(5)
        ipas = []
        for _ in range(2):
            n = r.take()
            L = [r.point() for _ in range(n)]
            R = [r.point() for _ in range(n)]
            a_final = r.take()
            ipas.append(IPAProof(L=L, R=R, a_final=a_final))
        spartan = SpartanProof(
            sc1_rounds=scs[0], vA=vA, vB=vB, vC=vC, vE=vE,
            sc2_rounds=scs[1], vZ=vZ, ipa_w=ipas[0], ipa_e=ipas[1],
        )
        w_final = e_final = None
    else:
        spartan = None
        nw = r.take()
        w_final = np.array(r.take(nw) if nw > 1 else [r.take()], dtype=object)
        ne = r.take()
        e_final = np.array(r.take(ne) if ne > 1 else [r.take()], dtype=object)
    return FoldProof(
        state_len=state_len, steps=steps, x_rows=x_rows,
        leaf_comm_w=leaf, node_comm_t=node_comm_t, u_final=u_final,
        w_final=w_final, e_final=e_final, spartan=spartan,
    )


# ----------------------------------------------------------------------
# JSON artifact
# ----------------------------------------------------------------------


def save_proof_json(path: str, proof, z0: list[int], zn: list[int]):
    doc = {
        "version": VERSION,
        "z0": [hex(int(v)) for v in z0],
        "zn": [hex(int(v)) for v in zn],
        "words": [hex(w) for w in proof_to_words(proof)],
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def load_proof_json(path: str):
    with open(path) as f:
        doc = json.load(f)
    if doc.get("version") != VERSION:
        raise ValueError(f"unsupported proof version {doc.get('version')!r}")
    proof = words_to_proof([int(w, 16) for w in doc["words"]])
    z0 = [int(v, 16) for v in doc["z0"]]
    zn = [int(v, 16) for v in doc["zn"]]
    return proof, z0, zn


# ----------------------------------------------------------------------
# EVM calldata (ABI encoding of the dynamic-verifier call)
# ----------------------------------------------------------------------


def _abi_word(v: int) -> bytes:
    return int(v).to_bytes(32, "big")


def encode_calldata(steps: int, init_state: list[int], final_state: list[int], words: list[int]) -> bytes:
    """ABI-encode verifyOpaqueNovaProofWithInputs(uint256,uint256[],uint256[],uint256[])."""
    head_slots = 4
    init_off = head_slots * 32
    final_off = init_off + 32 * (1 + len(init_state))
    proof_off = final_off + 32 * (1 + len(final_state))
    out = [SELECTOR]
    out.append(_abi_word(steps))
    out.append(_abi_word(init_off))
    out.append(_abi_word(final_off))
    out.append(_abi_word(proof_off))
    out.append(_abi_word(len(init_state)))
    out += [_abi_word(v) for v in init_state]
    out.append(_abi_word(len(final_state)))
    out += [_abi_word(v) for v in final_state]
    out.append(_abi_word(len(words)))
    out += [_abi_word(v) for v in words]
    return b"".join(out)


@dataclass
class ProofData:
    """Parsed calldata — the marketplace-SDK-side mirror of the reference's
    ProofData (marketplace/vimz_marketplace_sdk/artifacts.py:20-46)."""

    steps: int
    init_state: list[int]
    final_state: list[int]
    words: list[int]

    @classmethod
    def from_calldata(cls, data: bytes) -> "ProofData":
        if data[:4] != SELECTOR:
            raise ValueError("bad selector")
        body = data[4:]

        def word(i: int) -> int:
            return int.from_bytes(body[32 * i : 32 * (i + 1)], "big")

        steps = word(0)

        def array_at(byte_off: int) -> list[int]:
            base = byte_off // 32
            n = word(base)
            return [word(base + 1 + i) for i in range(n)]

        init = array_at(word(1))
        final = array_at(word(2))
        words = array_at(word(3))
        return cls(steps, init, final, words)

    def to_proof(self):
        return words_to_proof(self.words)
