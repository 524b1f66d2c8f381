"""Vectorized big-integer modular arithmetic for TPU (and CPU) via JAX.

Field elements are represented as 16 little-endian limbs of 16 bits each,
stored in uint32 lanes (shape ``(..., 16)``). This radix is chosen for the
TPU VPU: 16x16-bit limb products are exact in uint32 (no widening multiply
needed), and column sums of up to ~2000 partial products stay below 2^32,
so schoolbook multiplication needs no carry handling until a single final
carry-propagation pass.

Multiplication is Montgomery (R = 2^256): ``mul(a, b) = a*b*R^-1 mod p``.
Values on the hot paths are kept in Montgomery form. Linear combinations use
``mul_acc`` which sums K limb-products *before* the single Montgomery
reduction (lazy reduction) — this is what makes Poseidon MDS layers and R1CS
matrix-vector products cheap on the VPU.

The reference prover gets this arithmetic from arkworks (ark-bn254/ark-ff);
here it is a from-scratch vectorized design (no reference code involved).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from vimz_tpu.fields.prime import P_FQ, P_FR, PrimeField

NLIMB = 16
LIMB_BITS = 16
MASK = np.uint32(0xFFFF)
R_BITS = NLIMB * LIMB_BITS  # 256


def int_to_limbs(x: int, n: int = NLIMB) -> np.ndarray:
    """Python int -> little-endian uint32 limb array of length n."""
    assert 0 <= x < (1 << (n * LIMB_BITS))
    return np.array([(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(n)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs))


class LimbField:
    """Batched GF(p) arithmetic over (..., 16) uint32 limb arrays."""

    def __init__(self, p: int, name: str = "F"):
        assert p.bit_length() <= R_BITS - 2
        self.name = name
        self.p = p
        self.ref = PrimeField(p, name)
        self.R = (1 << R_BITS) % p
        self.R2 = (self.R * self.R) % p
        self.R3 = (self.R2 * self.R) % p
        # -p^-1 mod 2^256 (full-width N' for the low-half REDC multiply).
        self.np_full = (-pow(p, -1, 1 << R_BITS)) % (1 << R_BITS)

        self.p_limbs = int_to_limbs(p)
        self.p_limbs17 = int_to_limbs(p, 17)
        self.np_limbs = int_to_limbs(self.np_full)
        self.zero = np.zeros(NLIMB, dtype=np.uint32)
        self.one_mont = int_to_limbs(self.R)
        self.r2_limbs = int_to_limbs(self.R2)

    # ------------------------------------------------------------------
    # Conversions
    # ------------------------------------------------------------------

    @staticmethod
    def _obj_to_limbs(arr: np.ndarray) -> np.ndarray:
        """Object-int array (already reduced) -> (..., 16) uint32 limbs
        (vectorized shifts; no per-element Python loop)."""
        pieces = [((arr >> (LIMB_BITS * i)) & 0xFFFF) for i in range(NLIMB)]
        return np.stack(pieces, axis=-1).astype(np.uint32)

    def to_limbs(self, values) -> np.ndarray:
        """Python ints (nested lists ok) -> limb array, NOT Montgomery form."""
        arr = np.asarray(values, dtype=object) % self.p
        return self._obj_to_limbs(arr)

    def from_limbs(self, limbs) -> np.ndarray:
        """Limb array -> numpy object array of Python ints."""
        limbs = np.asarray(limbs)
        acc = np.zeros(limbs.shape[:-1], dtype=object)
        for i in range(limbs.shape[-1]):
            acc = acc + (limbs[..., i].astype(object) << (LIMB_BITS * i))
        return acc

    def to_mont(self, a):
        return self.mul(a, jnp.asarray(self.r2_limbs))

    def to_mont_j(self, a):
        """Jitted to_mont (cached): the eager version dispatches ~50 tiny
        ops per call — over a tunneled device that is seconds per call."""
        if not hasattr(self, "_to_mont_jit"):
            import jax

            self._to_mont_jit = jax.jit(self.to_mont)
        return self._to_mont_jit(a)

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    def to_limbs_mont(self, values) -> np.ndarray:
        """Python ints -> Montgomery-form limbs (host-side, exact)."""
        arr = (np.asarray(values, dtype=object) % self.p) * self.R % self.p
        return self._obj_to_limbs(arr)

    def from_limbs_mont(self, limbs) -> np.ndarray:
        vals = self.from_limbs(limbs)
        rinv = pow(self.R, -1, self.p)
        return np.vectorize(lambda v: v * rinv % self.p, otypes=[object])(vals)

    # ------------------------------------------------------------------
    # Carry machinery
    # ------------------------------------------------------------------

    @staticmethod
    def _shift_limbs(arr, d: int):
        """Shift limb values toward higher indices by d (zero-fill low side)."""
        if d == 0:
            return arr
        pad = jnp.zeros(arr.shape[:-1] + (d,), dtype=arr.dtype)
        return jnp.concatenate([pad, arr[..., :-d]], axis=-1)

    @classmethod
    def _carry_propagate(cls, cols, out_len: int):
        """Resolve (..., n) uint32 column sums into (..., out_len) 16-bit limbs.

        The value is sum(cols[i] << 16*i) and must fit out_len limbs.
        Branch-free Kogge–Stone carry lookahead: two split-and-add passes
        reduce residual carries to <= 1, then a log-depth generate/propagate
        prefix resolves the ripple — no sequential scan, pure VPU ops.
        """
        n = cols.shape[-1]
        if out_len > n:
            cols = jnp.concatenate(
                [cols, jnp.zeros(cols.shape[:-1] + (out_len - n,), dtype=jnp.uint32)],
                axis=-1,
            )
        x = cols[..., :out_len]
        # pass 1: carries < 2^16
        s = (x & MASK) + cls._shift_limbs(x >> LIMB_BITS, 1)
        # pass 2: carries in {0, 1}
        s = (s & MASK) + cls._shift_limbs(s >> LIMB_BITS, 1)
        # now s <= 2^16; lookahead over unit carries
        g = s >> LIMB_BITS  # {0,1} generate
        r = s & MASK
        p = (r == MASK).astype(jnp.uint32)  # propagate
        G, Pp = g, p
        d = 1
        while d < out_len:
            G = G | (Pp & cls._shift_limbs(G, d))
            Pp = Pp & cls._shift_limbs(Pp, d)
            d <<= 1
        carry_in = cls._shift_limbs(G, 1)
        return (r + carry_in) & MASK

    @classmethod
    def _sub_with_borrow(cls, a, b):
        """a - b over equal-length limb arrays; returns (diff, borrow_flag).

        Borrow lookahead mirrors the carry lookahead: generate = a_i < b_i,
        propagate = a_i == b_i.
        """
        b = jnp.broadcast_to(b, a.shape)
        n = a.shape[-1]
        g = (a < b).astype(jnp.uint32)
        p = (a == b).astype(jnp.uint32)
        G, Pp = g, p
        d = 1
        while d < n:
            G = G | (Pp & cls._shift_limbs(G, d))
            Pp = Pp & cls._shift_limbs(Pp, d)
            d <<= 1
        borrow_in = cls._shift_limbs(G, 1)
        diff = (a - b - borrow_in) & MASK
        return diff, G[..., -1]

    @classmethod
    def _cond_sub(cls, a, m):
        """a - m where a >= m else a (limb arrays of equal length)."""
        d, borrow = cls._sub_with_borrow(a, jnp.broadcast_to(m, a.shape))
        return jnp.where((borrow == 0)[..., None], d, a)

    # ------------------------------------------------------------------
    # Add / sub / neg (standard or Montgomery form — form-agnostic)
    # ------------------------------------------------------------------

    def add(self, a, b):
        s = self._carry_propagate(a + b, NLIMB + 1)
        return self._cond_sub(s, jnp.asarray(self.p_limbs17))[..., :NLIMB]

    def sub(self, a, b):
        d, borrow = self._sub_with_borrow(a, jnp.broadcast_to(b, a.shape))
        fixed = self._carry_propagate(d + jnp.asarray(self.p_limbs), NLIMB)
        return jnp.where((borrow == 0)[..., None], d, fixed)

    def neg(self, a):
        return self.sub(jnp.broadcast_to(jnp.asarray(self.zero), a.shape), a)

    # ------------------------------------------------------------------
    # Multiplication
    # ------------------------------------------------------------------

    # Column-sum formulation of schoolbook multiplication, built by placing
    # the 16 partial products of each limb j of `b` at column offset j (lo
    # halves) and j+1 (hi halves) via static pads, then summing. Pure
    # elementwise + pad ops fuse into one VPU pass; crucially there is NO
    # gather — an earlier take_along_axis antidiagonal formulation
    # materialized (..., 16, ncols) gathered tensors, which at fold-prover
    # batch sizes (128 steps x 4096 lanes x K=64) padded out to 16 GB per
    # operand and OOMed the TPU at compile time.
    @staticmethod
    def _place(x, off: int, ncols: int):
        """Pad (..., n) columns to (..., ncols) at column offset `off`."""
        take = min(x.shape[-1], ncols - off)
        if take <= 0:
            return None
        if take < x.shape[-1]:
            x = x[..., :take]
        cfg = [(0, 0)] * (x.ndim - 1) + [(off, ncols - off - take)]
        return jnp.pad(x, cfg)

    @classmethod
    def _mul_columns(cls, a, b, ncols: int):
        """Schoolbook product column sums of two (..., 16) limb arrays.

        Returns (..., ncols) uint32 columns of value a*b.
        """
        a = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
        cols = None
        for j in range(NLIMB):
            p = a * b[..., j : j + 1]  # (..., 16) exact in uint32
            for part, off in ((p & MASK, j), (p >> LIMB_BITS, j + 1)):
                placed = cls._place(part, off, ncols)
                if placed is not None:
                    cols = placed if cols is None else cols + placed
        return cols

    @classmethod
    def _mul_columns_acc(cls, a, b, ncols: int):
        """Column sums of sum_k a_k * b_k for (..., K, 16) stacks (K <= 2047).

        The K contraction happens inside each limb-j pass (a fused
        multiply+mask+reduce), so no (..., K, 16, ncols) tensor ever exists.
        """
        assert a.shape[-2] == b.shape[-2] or a.shape[-2] == 1 or b.shape[-2] == 1
        K = max(a.shape[-2], b.shape[-2])
        assert K <= 2047, "column sums would overflow uint32"
        cols = None
        for j in range(NLIMB):
            p = a * b[..., j : j + 1]  # (..., K, 16)
            lo = jnp.sum(p & MASK, axis=-2)  # (..., 16), < K * 2^16
            hi = jnp.sum(p >> LIMB_BITS, axis=-2)
            for part, off in ((lo, j), (hi, j + 1)):
                placed = cls._place(part, off, ncols)
                if placed is not None:
                    cols = placed if cols is None else cols + placed
        return cols

    def _low_mul(self, a, b):
        """(a * b) mod 2^256 over (..., 16) limb arrays -> (..., 16) limbs."""
        cols = self._mul_columns(a, b, NLIMB)
        return self._carry_propagate(cols, NLIMB)

    def _redc(self, cols, nsub: int):
        """Montgomery reduction of product column sums -> (..., 16) limbs < p.

        `cols` is (..., ncols) representing T; requires T < 2^512-ish and
        T*R^-1 mod p reachable with `nsub` staged conditional subtractions.
        """
        ncols = cols.shape[-1]
        T = self._carry_propagate(cols, ncols + 1)
        m = self._low_mul(T[..., :NLIMB], jnp.asarray(self.np_limbs))
        width = max(T.shape[-1], 2 * NLIMB + 1)
        mN = self._mul_columns(m, jnp.asarray(self.p_limbs), width)
        scols = mN.at[..., : T.shape[-1]].add(T)
        S = self._carry_propagate(scols, 2 * NLIMB + 2)
        t = S[..., NLIMB:]  # low 256 bits are zero by construction
        # Staged conditional subtraction down to [0, p).
        for k in reversed(range(nsub)):
            mult = self.p * (1 << k)
            t = self._cond_sub(t, jnp.asarray(int_to_limbs(mult, t.shape[-1])))
        return t[..., :NLIMB]

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p."""
        cols = self._mul_columns(a, b, 2 * NLIMB)
        return self._redc(cols, nsub=1)

    def mul_acc(self, a, b):
        """Montgomery sum of products: (sum_k a_k*b_k) * R^-1 mod p.

        a, b: (..., K, 16) (broadcastable on the K axis). Single lazy
        reduction — K limb-multiplies but only one REDC.
        """
        K = max(a.shape[-2], b.shape[-2])
        cols = self._mul_columns_acc(a, b, 2 * NLIMB + 1)
        # Result of REDC is < p * (1 + K * p/R); pick subtraction stages to cover.
        bound_num = self.p * K  # t < p * (1 + K*p/R) <= p * (1 + ceil(K*p/R))
        extra = (bound_num + (1 << R_BITS) - 1) >> R_BITS
        nsub = max(1, (1 + extra).bit_length())
        return self._redc(cols, nsub=nsub)

    def square(self, a):
        return self.mul(a, a)

    def sum_reduce(self, a, axis: int = -2):
        """Modular sum over one axis: (..., N, ..., 16) -> (..., ..., 16).

        Pairwise log-depth tree of `add` (2N limb-adds total) — used by the
        sumcheck prover to collapse evaluation tables.
        """
        a = jnp.moveaxis(a, axis, -2)
        n = a.shape[-2]
        if n == 0:
            return jnp.zeros(a.shape[:-2] + (NLIMB,), dtype=jnp.uint32)
        np2 = 1 << max(0, (n - 1).bit_length())
        if np2 != n:
            pad = jnp.zeros(a.shape[:-2] + (np2 - n, NLIMB), dtype=jnp.uint32)
            a = jnp.concatenate([a, pad], axis=-2)
        while np2 > 1:
            a = self.add(a[..., 0::2, :], a[..., 1::2, :])
            np2 //= 2
        return a[..., 0, :]

    # ------------------------------------------------------------------
    # Exponentiation / inversion (Montgomery form in -> Montgomery form out)
    # ------------------------------------------------------------------

    def pow_const(self, a, e: int):
        """a^e for a in Montgomery form; e a static Python int."""
        bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], dtype=jnp.uint32)
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)

        def body(i, acc):
            acc = self.square(acc)
            bit = bits[e.bit_length() - 1 - i]
            return jnp.where(bit == 1, self.mul(acc, a), acc)

        return lax.fori_loop(0, e.bit_length(), body, one)

    def inv(self, a):
        """Batched inversion via Fermat (a in Montgomery form). inv(0) = 0."""
        return self.pow_const(a, self.p - 2)

    # ------------------------------------------------------------------
    # Predicates
    # ------------------------------------------------------------------

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=-1)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    def geq_p(self, a):
        _, borrow = self._sub_with_borrow(a, jnp.broadcast_to(jnp.asarray(self.p_limbs), a.shape))
        return borrow == 0

    @staticmethod
    def select(mask, a, b):
        """mask (...,) boolean: a where mask else b."""
        return jnp.where(mask[..., None], a, b)

    def __repr__(self):
        return f"LimbField({self.name})"


FR_LIMBS = LimbField(P_FR, "Fr")
FQ_LIMBS = LimbField(P_FQ, "Fq")
