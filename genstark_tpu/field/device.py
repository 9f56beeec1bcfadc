"""Device-side (JAX) prime-field arithmetic over 16-bit-limb uint32 arrays.

All batch field operations used by the prover's hot path run here:
elementwise add/sub/mul (Montgomery CIOS), exponentiation by static ints,
Fermat batch inversion, power series, and random linear combinations.  These
replace the reference's WASM kernels in `@guildofweavers/galois` (consumed at
/root/reference/lib/Stark.ts:106-109 and throughout lib/components/).

Layout: an array of N elements is ``uint32[L, N]`` — limbs along the leading
axis so the batch dimension fills TPU lanes.  Values on device are kept in
Montgomery form (x*R mod p with R = 2^(16 L)); conversion to/from standard
form happens only at protocol boundaries (hashing / serialization / host).

Everything here is jit-friendly: static shapes, python loops over limb count
only (unrolled at trace time).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, MontParams, int_to_limbs, ints_to_limbs, limbs_to_ints

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


class DeviceField:
    """Vectorized Montgomery arithmetic for one prime modulus."""

    def __init__(self, params: MontParams):
        self.params = params
        self.L = params.L
        self.p = params.modulus
        self._n0p = np.uint32(params.n0p)
        self._p_np = params.p_limbs.astype(np.uint32)
        # Jitted entry points: the raw methods build ~L^2 primitive graphs,
        # so eager per-op dispatch is prohibitive — always go through XLA.
        self.add = jax.jit(self._add)
        self.sub = jax.jit(self._sub)
        self.neg = jax.jit(self._neg)
        self.mul = jax.jit(self.mont_mul)
        self.sqr = jax.jit(self._sqr)
        self.exp_static = jax.jit(self._exp_static, static_argnums=1)
        self._inv_jit = jax.jit(self._inv_impl)
        self.to_mont = jax.jit(self._to_mont)
        self.from_mont = jax.jit(self._from_mont)
        self.power_series = jax.jit(self._power_series, static_argnums=(0, 1))
        self._combine_many_jit = jax.jit(self._combine_many, static_argnums=1)
        self.combine_many = lambda vectors, coeffs: self._combine_many_jit(
            vectors, tuple(int(c) for c in coeffs))

    # ----- helpers ----------------------------------------------------------
    def _plimb(self, i: int):
        return self._p_np[i]

    def zeros(self, shape) -> jnp.ndarray:
        return jnp.zeros((self.L,) + tuple(shape), dtype=_U32)

    # ----- host <-> device conversion (standard form ints) ------------------
    def from_ints(self, values: Sequence[int], to_mont: bool = True) -> jnp.ndarray:
        arr = jnp.asarray(ints_to_limbs(values, self.L))
        return self.to_mont(arr) if to_mont else arr

    def to_ints(self, arr: jnp.ndarray, from_mont: bool = True) -> List[int]:
        if from_mont:
            arr = self.from_mont(arr)
        flat = np.asarray(arr).reshape(self.L, -1)
        return limbs_to_ints(flat)

    def const(self, value: int, shape=(), to_mont: bool = True) -> jnp.ndarray:
        """Broadcastable constant: [L] + [1]*len(shape)."""
        if to_mont:
            value = (value * self.params.R_mod) % self.p
        limbs = int_to_limbs(value % self.p, self.L)
        return jnp.asarray(limbs).reshape((self.L,) + (1,) * len(shape))

    # ----- Pallas elementwise dispatch --------------------------------------
    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _use_pallas_ops() -> bool:
        """Route large elementwise ops through the VMEM tile kernels
        (field/pallas_ops.py) on TPU: the jnp accumulator-array formulation
        round-trips ~2x-the-data per partial product through HBM — one
        full-domain mont_mul at 2^21 measures ~22 ms vs ~0.4 ms tiled.
        GENSTARK_NO_PALLAS=1 disables (same kill switch as the kernels)."""
        import os
        if os.environ.get("GENSTARK_NO_PALLAS"):
            return False
        return jax.default_backend() == "tpu"

    _pallas_min_n = 1 << 16   # below this the kernel-count cost outweighs

    def _pallas_elementwise(self, op: str, a: jnp.ndarray, b: jnp.ndarray):
        """Tile-kernel fast path for mul/add/sub, or None to fall back.
        Handles same-batch-shape operands and [L, 1...]-broadcast scalars
        (either side for commutative ops)."""
        if not self._use_pallas_ops() or self.L < 8:
            # Mosaic tile kernels need >= 8 sublanes (p32 has L = 2)
            return None
        a_sc = all(d == 1 for d in a.shape[1:])
        b_sc = all(d == 1 for d in b.shape[1:])
        if a_sc and op in ("mul", "add") and not b_sc:
            a, b = b, a
            a_sc, b_sc = b_sc, a_sc
        if a_sc:
            return None
        n = 1
        for d in a.shape[1:]:
            n *= d
        if n < self._pallas_min_n or n % 2048:
            return None
        if not b_sc and b.shape[1:] != a.shape[1:]:
            return None
        from . import pallas_ops
        b2 = b.reshape(self.L, 1) if b_sc else b.reshape(self.L, n)
        out = pallas_ops.elementwise(self, op, a.reshape(self.L, n), b2)
        return out.reshape(a.shape)

    def outer_table(self, outer: jnp.ndarray, inner: jnp.ndarray
                    ) -> jnp.ndarray:
        """[L, nj] x [L, s] -> [L, nj*s] Montgomery outer product
        t[j*s + k] = outer[j]*inner[k] (factored power-table regeneration).
        Tile kernel on TPU; jnp broadcast elsewhere."""
        if self._use_pallas_ops() and self.L >= 8:
            from . import pallas_ops
            out = pallas_ops.outer_product_table(self, outer, inner)
            if out is not None:
                return out
        full = self.mont_mul(outer[:, :, None], inner[:, None, :])
        return full.reshape(self.L, outer.shape[1] * inner.shape[1])

    # ----- Montgomery core --------------------------------------------------
    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """SOS Montgomery multiplication: returns a*b*R^-1 mod p.

        a, b: uint32[L, ...] broadcast-compatible; limbs < 2^16.

        Structured as limb-axis *vector* operations with lazy (carry-free)
        uint32 accumulators: every partial product is split into lo/hi 16-bit
        halves that are added into a [2L+1, ...] accumulator without carry
        chains (entries stay < 2^22), and carries are resolved once per
        Montgomery step plus one final pass.  This keeps the XLA graph at
        O(L) primitives per multiply; the naive per-limb CIOS formulation
        (O(L^2) scalar primitives with deep diamond dependencies) triggers
        pathological compile times in XLA:CPU.
        """
        L = self.L
        # normalize ranks: batch axes broadcast right-aligned AFTER the limb
        # axis, so a lower-rank operand gets singleton batch dims inserted
        # right after axis 0 (plain right-alignment would smear the limb axis
        # into a batch axis).
        if a.ndim < b.ndim:
            a = a.reshape((L,) + (1,) * (b.ndim - a.ndim) + a.shape[1:])
        elif b.ndim < a.ndim:
            b = b.reshape((L,) + (1,) * (a.ndim - b.ndim) + b.shape[1:])
        fast = self._pallas_elementwise("mul", a, b)
        if fast is not None:
            return fast
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        acc = jnp.zeros((2 * L + 1,) + shape, dtype=_U32)
        p_arr = jnp.asarray(self._p_np).reshape((L,) + (1,) * len(shape))
        npad = [(0, 0)] * len(shape)

        def _off_add(acc, x, off):
            # acc[off:off+x.shape[0]] += x via pad+add: static-slice .at[].add
            # lowers to scatter-add, which is pathological for XLA compile
            # time at this op count (thousands of instances in one program).
            return acc + jnp.pad(x, [(off, acc.shape[0] - off - x.shape[0])] + npad)

        # product phase: acc += a_i * b at offset i, lo/hi split
        for i in range(L):
            prod = a[i][None] * b                      # [L, ...]
            acc = _off_add(acc, prod & _MASK, i)
            acc = _off_add(acc, prod >> LIMB_BITS, i + 1)
        # reduction phase: L sequential steps, each O(1) vector ops
        c = jnp.zeros(shape, dtype=_U32)
        for i in range(L):
            x = acc[i] + c
            m = ((x & _MASK) * self._n0p) & _MASK      # [...]
            mp = m[None] * p_arr                       # [L, ...]
            c = (x + (mp[0] & _MASK)) >> LIMB_BITS
            if L > 1:
                acc = _off_add(acc, mp[1:] & _MASK, i + 1)
            acc = _off_add(acc, mp >> LIMB_BITS, i + 1)
        # final carry resolution over result limbs L..2L-1 (value < 2p)
        t = []
        for k in range(L):
            s = acc[L + k] + c
            t.append(s & _MASK)
            c = s >> LIMB_BITS
        return self._cond_sub_p(t, c)

    def _cond_sub_p(self, limbs: List[jnp.ndarray], carry: jnp.ndarray) -> jnp.ndarray:
        """Given value = carry*2^(16L) + limbs < 2p, subtract p if >= p."""
        L = self.L
        diff = [None] * L
        borrow = jnp.zeros_like(limbs[0])
        for j in range(L):
            s = limbs[j] - self._plimb(j) - borrow
            diff[j] = s & _MASK
            borrow = (s >> 31) & np.uint32(1)  # borrow iff underflow (top bit set)
        # value >= p iff carry==1 or borrow==0
        take_diff = (carry | (np.uint32(1) - borrow)).astype(jnp.bool_)
        out = [jnp.where(take_diff, diff[j], limbs[j]) for j in range(L)]
        return jnp.stack(out, axis=0)

    def _add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        L = self.L
        if a.ndim == b.ndim:
            fast = self._pallas_elementwise("add", a, b)
            if fast is not None:
                return fast
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        t = []
        c = jnp.zeros(shape, dtype=_U32)
        for j in range(L):
            s = a[j] + b[j] + c
            t.append(s & _MASK)
            c = s >> LIMB_BITS
        return self._cond_sub_p(t, c)

    def _sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        L = self.L
        if a.ndim == b.ndim:
            fast = self._pallas_elementwise("sub", a, b)
            if fast is not None:
                return fast
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        t = []
        borrow = jnp.zeros(shape, dtype=_U32)
        for j in range(L):
            s = a[j] - b[j] - borrow
            t.append(s & _MASK)
            borrow = (s >> 31) & np.uint32(1)
        # if borrow: add p back
        add_p = borrow.astype(jnp.bool_)
        c = jnp.zeros(shape, dtype=_U32)
        t2 = []
        for j in range(L):
            s = t[j] + self._plimb(j) + c
            t2.append(s & _MASK)
            c = s >> LIMB_BITS
        out = [jnp.where(add_p, t2[j], t[j]) for j in range(L)]
        return jnp.stack(out, axis=0)

    def _neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._sub(self.zeros(a.shape[1:]), a)

    def _sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def _to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        r2 = jnp.asarray(self.params.r2_limbs).reshape((self.L,) + (1,) * (a.ndim - 1))
        return self.mont_mul(a, r2)

    def _from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.asarray(int_to_limbs(1, self.L)).reshape(
            (self.L,) + (1,) * (a.ndim - 1))
        return self.mont_mul(a, one)

    def one(self, shape=()) -> jnp.ndarray:
        """Montgomery representation of 1, broadcastable over shape."""
        return jnp.asarray(self.params.one_mont_limbs).reshape((self.L,) + (1,) * len(shape))

    # ----- derived ops ------------------------------------------------------
    def _exp_static(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a small python-int exponent (unrolled square-and-multiply).

        Constraint exponents are always small (AirAssembly requires static
        exponents); inversion goes through `inv`, never through here.
        """
        e %= (self.p - 1) if self.p > 2 else 1
        if e == 0:
            return jnp.broadcast_to(self.one(a.shape[1:]), a.shape)
        if e >= (1 << 24):
            raise ValueError("exp_static is for small static exponents; use inv()")
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mont_mul(result, base)
            e >>= 1
            if e:
                base = self.mont_mul(base, base)
        return result

    # ----- batched inversion (Montgomery's trick, log-doubling scans) -------
    def _scan_products(self, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
        """Inclusive prefix (or suffix) products along axis 1 via Hillis-Steele
        log-doubling: log2(N) vectorized mont_muls instead of a sequential scan."""
        n = x.shape[1]
        k = 1
        while k < n:
            ident = jnp.broadcast_to(self.one((1,)), (self.L, k))
            if reverse:
                shifted = jnp.concatenate([x[:, k:], ident], axis=1)
            else:
                shifted = jnp.concatenate([ident, x[:, :-k]], axis=1)
            x = self.mont_mul(x, shifted)
            k *= 2
        return x

    def _inv_products_impl(self, flat: jnp.ndarray):
        is_zero = jnp.all(flat == 0, axis=0)                      # [N]
        one = jnp.broadcast_to(self.one((1,)), flat.shape)
        safe = jnp.where(is_zero[None, :], one, flat)
        prefix = self._scan_products(safe, reverse=False)
        suffix = self._scan_products(safe, reverse=True)
        return is_zero, prefix, suffix

    def _inv_finish_impl(self, is_zero, prefix, suffix, total_inv):
        L, n = prefix.shape
        ident = jnp.broadcast_to(self.one((1,)), (L, 1))
        pre_excl = jnp.concatenate([ident, prefix[:, :-1]], axis=1)   # prod_{k<i}
        suf_excl = jnp.concatenate([suffix[:, 1:], ident], axis=1)    # prod_{k>i}
        out = self.mont_mul(self.mont_mul(pre_excl, suf_excl), total_inv)
        return jnp.where(is_zero[None, :], jnp.zeros_like(out), out)

    def _fermat_inv_single(self, t: jnp.ndarray) -> jnp.ndarray:
        """t^(p-2) for a single element [L, 1] (Montgomery) — square-and-
        multiply as a fori_loop over the fixed exponent bits (a loop, not an
        unroll: ~250 inlined mont_muls make XLA compiles pathologically slow).
        Cheap at runtime because it runs on one element; used only for the
        total product in `inv`."""
        e = self.p - 2
        bits = bin(e)[2:]
        bit_arr = jnp.asarray([int(b) for b in bits], dtype=jnp.bool_)

        def body(i, result):
            sq = self.mont_mul(result, result)
            return jnp.where(bit_arr[i], self.mont_mul(sq, t), sq)

        return jax.lax.fori_loop(1, len(bits), body, t)

    def _inv_impl(self, flat: jnp.ndarray) -> jnp.ndarray:
        is_zero, prefix, suffix = self._inv_products_impl(flat)
        total_inv = self._fermat_inv_single(prefix[:, -1:])
        return self._inv_finish_impl(is_zero, prefix, suffix, total_inv)

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Elementwise inverse with inv(0) = 0 (galois WASM convention, relied
        on for Z(x) inverses at excluded trace positions —
        /root/reference/lib/components/CompositionPolynomial.ts:117).

        Batched Montgomery trick, fully on device (jit-safe, no host sync):
        two log-doubling product scans, one single-element Fermat ladder for
        the total, two muls to finish — ~3 mont_muls per element.
        """
        shape = a.shape
        out = self._inv_jit(a.reshape(self.L, -1))
        return out.reshape(shape)

    def _power_series(self, seed_int: int, length: int) -> jnp.ndarray:
        """[1, s, s^2, ..., s^(length-1)] in Montgomery form via log-doubling."""
        assert length >= 1
        out = self.one((1,))  # [L, 1]
        step = (seed_int * self.params.R_mod) % self.p
        cur = 1
        while cur < length:
            # multiplier = s^cur (standard int math on host), in mont form
            mult_int = (pow(seed_int, cur, self.p) * self.params.R_mod) % self.p
            mult = jnp.asarray(int_to_limbs(mult_int, self.L)).reshape(self.L, 1)
            nxt = self.mont_mul(out, mult)
            out = jnp.concatenate([out, nxt], axis=1)
            cur *= 2
        return out[:, :length]

    def combine_many_mont(self, vectors, coeffs_mont: jnp.ndarray) -> jnp.ndarray:
        """Random linear combination with device-resident coefficients:
        sum_k coeffs_mont[:, k] * vectors[k].  vectors: list of [L, N]
        (Montgomery); coeffs_mont: [L, K] (Montgomery, possibly traced —
        the fused prover derives them from the transcript on device)."""
        acc = None
        for k in range(len(vectors)):
            term = self.mont_mul(vectors[k], coeffs_mont[:, k:k + 1])
            acc = term if acc is None else self._add(acc, term)
        return acc

    def _combine_many(self, vectors: jnp.ndarray, coeffs: Sequence[int]) -> jnp.ndarray:
        """Random linear combination: sum_k coeffs[k] * vectors[k].

        vectors: [K, L, N] array or list of [L, N] arrays (Montgomery);
        coeffs: python ints (standard form).  Mirrors galois
        `combineManyVectors` (/root/reference/lib/components/CompositionPolynomial.ts:105).
        """
        K = len(vectors)
        acc = None
        for k in range(K):
            c = self.const(int(coeffs[k]), shape=(1,))
            term = self.mont_mul(vectors[k], c)
            acc = term if acc is None else self.add(acc, term)
        return acc
