import os, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax
from vimz_tpu.utils.backend import enable_compile_cache
enable_compile_cache(jax.default_backend())
import numpy as np, jax.numpy as jnp
from vimz_tpu.circuits import synthesize
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.folding.nova import FoldingProver, _index_points
from vimz_tpu.fields.limbs import FR_LIMBS as f
from vimz_tpu.pipeline.input import Transformation, VIMzInput
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.editor.ops import pack_words_rows
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (8, 1280, 3), dtype=np.uint8)
inp = VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})
r1cs = synthesize(Transformation.GRAYSCALE, inp)
d = DeviceR1CS(r1cs)
pr = FoldingProver(d)
from vimz_tpu.r1cs.witness import execute_tape
t0=time.time(); z = execute_tape(r1cs, 0, 8); jax.block_until_ready(z); print("tape ok", round(time.time()-t0,1), flush=True)
z1, z2 = z[0::2], z[1::2]
pad = 8 - z1.shape[0]
z1 = jnp.concatenate([z1, jnp.zeros((pad,)+z1.shape[1:], z1.dtype)])
z2 = jnp.concatenate([z2, jnp.zeros((pad,)+z2.shape[1:], z2.dtype)])
u = jnp.asarray(f.to_limbs_mont(np.ones(8, dtype=object)))
t0=time.time(); T = d.cross_term(z1, u, z2, u); jax.block_until_ready(T); print("cross_term ok", round(time.time()-t0,1), flush=True)
t0=time.time(); T2 = d.cross_term(z1, u, z2, u); jax.block_until_ready(T2); print("cross_term warm", round(time.time()-t0,2), flush=True)
t0=time.time(); Ts = pr._from_mont_rows(T[:4]); jax.block_until_ready(Ts); print("from_mont ok", round(time.time()-t0,1), flush=True)
bases_c = _index_points(pr.bases, slice(0, d.n_constraints))
t0=time.time(); ct = pr._msm_chunked(Ts, bases_c, pr.MSM_CHUNK); jax.block_until_ready(ct["x"]); print("msm ok", round(time.time()-t0,1), flush=True)
t0=time.time(); aff = pr.to_affine(ct); print("to_affine ok", round(time.time()-t0,1), len(aff), flush=True)
