"""Multi-chip sharding correctness (VERDICT r4 item 6b).

The conftest forces an 8-virtual-device CPU backend, so the mesh path the
driver's dryrun exercises on N devices is tested here in-repo: a prove
sharded over the full 8-device 'fold' mesh must be BIT-IDENTICAL to the
single-device prove (the sharding is pure data parallelism — see
FoldingProver._shard), and must verify.
"""

import numpy as np
import jax
import pytest

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.folding import FoldingProver, FoldingVerifier
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.parallel.mesh import fold_mesh, sharded_msm_partials
from vimz_tpu.pipeline.input import Transformation

from tests.test_circuits import make_input, tiny_image


@pytest.fixture(scope="module")
def tiny_r1cs():
    img = tiny_image(h=16, w=20, seed=21)  # 2 fold steps per virtual device
    inp = make_input(img, convert_to_grayscale(img))
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    return r1cs, DeviceR1CS(r1cs)


def _prove(r1cs, d, mesh):
    prover = FoldingProver(d, mesh=mesh)
    # deterministic blinds: both proves must be bit-identical
    return prover.prove(r1cs, host_witness=True, rng=np.random.default_rng(0))


def test_mesh_prove_bit_identical(tiny_r1cs, monkeypatch):
    monkeypatch.setenv("VIMZ_MSM_IMPL", "ladder")
    r1cs, d = tiny_r1cs
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = fold_mesh(8)

    single = _prove(r1cs, d, mesh=None)
    sharded = _prove(r1cs, d, mesh=mesh)

    assert single.leaf_comm_w == sharded.leaf_comm_w
    assert single.node_comm_t == sharded.node_comm_t
    assert single.u_final == sharded.u_final
    assert np.array_equal(single.x_rows, sharded.x_rows)
    assert list(single.w_final) == list(sharded.w_final)
    assert list(single.e_final) == list(sharded.e_final)

    zn = [int(v) for v in r1cs.witness[-1, 1 + 2 : 1 + 4]]
    assert FoldingVerifier(d).verify(sharded, [0, 0], zn)


def test_sharded_msm_matches_single(monkeypatch):
    """Base-partitioned MSM (all_gather combine) == plain ladder MSM."""
    import jax.numpy as jnp

    from vimz_tpu.curves import bn254_batched
    from vimz_tpu.fields.limbs import int_to_limbs

    curve = bn254_batched()
    mesh = fold_mesh(8)
    n = 16
    bases = curve.pedersen_bases(n)
    rng = np.random.default_rng(3)
    scalars = jnp.asarray(
        np.stack([int_to_limbs(int(x)) for x in rng.integers(1, 1 << 62, size=n)])
    )
    got = sharded_msm_partials(curve, mesh, scalars, bases, impl="ladder")
    want = curve.msm_ladder(scalars, bases)
    assert curve.to_affine_ints(got) == curve.to_affine_ints(want)
