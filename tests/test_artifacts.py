"""Proof artifact serialization tests: word flattening, JSON, EVM calldata."""

import numpy as np

from vimz_tpu.folding.nova import FoldProof
from vimz_tpu.pipeline.artifacts import (
    ProofData,
    encode_calldata,
    load_proof_json,
    proof_to_words,
    save_proof_json,
    words_to_proof,
)
from vimz_tpu.snark.ipa import IPAProof
from vimz_tpu.snark.spartan import SpartanProof


def _sample_proof(compressed: bool) -> FoldProof:
    rng = np.random.default_rng(0)

    def pt():
        return (int(rng.integers(1, 2**60)), int(rng.integers(1, 2**60)))

    x_rows = np.array([[1, 2], [2, 3], [3, 4]], dtype=object)
    common = dict(
        state_len=1,
        steps=3,
        x_rows=x_rows,
        leaf_comm_w=[pt(), None, pt()],
        node_comm_t=[[pt()], [pt()]],
        u_final=7,
    )
    if compressed:
        sp = SpartanProof(
            sc1_rounds=[[1, 2, 3], [4, 5, 6]],
            vA=11, vB=12, vC=13, vE=14,
            sc2_rounds=[[7, 8]],
            vZ=15,
            ipa_w=IPAProof(L=[pt()], R=[pt()], a_final=21),
            ipa_e=IPAProof(L=[pt(), None], R=[pt(), pt()], a_final=22),
        )
        return FoldProof(**common, spartan=sp)
    return FoldProof(
        **common,
        w_final=np.array([5, 6, 7], dtype=object),
        e_final=np.array([8, 9], dtype=object),
    )


def _assert_same(a: FoldProof, b: FoldProof):
    assert a.steps == b.steps and a.state_len == b.state_len
    assert a.leaf_comm_w == b.leaf_comm_w
    assert a.node_comm_t == b.node_comm_t
    assert np.all(a.x_rows == b.x_rows)
    assert a.u_final == b.u_final
    if a.spartan is None:
        assert b.spartan is None
        assert list(a.w_final) == list(b.w_final)
        assert list(a.e_final) == list(b.e_final)
    else:
        sa, sb = a.spartan, b.spartan
        assert sa.sc1_rounds == sb.sc1_rounds and sa.sc2_rounds == sb.sc2_rounds
        assert (sa.vA, sa.vB, sa.vC, sa.vE, sa.vZ) == (sb.vA, sb.vB, sb.vC, sb.vE, sb.vZ)
        assert sa.ipa_w.L == sb.ipa_w.L and sa.ipa_e.R == sb.ipa_e.R
        assert sa.ipa_w.a_final == sb.ipa_w.a_final


def test_words_roundtrip_both_modes():
    for compressed in (False, True):
        p = _sample_proof(compressed)
        words = proof_to_words(p)
        q = words_to_proof(words)
        _assert_same(p, q)


def test_json_roundtrip(tmp_path):
    p = _sample_proof(True)
    path = str(tmp_path / "proof.json")
    save_proof_json(path, p, [1], [2])
    q, z0, zn = load_proof_json(path)
    _assert_same(p, q)
    assert z0 == [1] and zn == [2]


def test_calldata_roundtrip():
    p = _sample_proof(True)
    words = proof_to_words(p)
    data = encode_calldata(p.steps, [1, 2], [3, 4], words)
    pd = ProofData.from_calldata(data)
    assert pd.steps == p.steps
    assert pd.init_state == [1, 2] and pd.final_state == [3, 4]
    _assert_same(pd.to_proof(), p)
