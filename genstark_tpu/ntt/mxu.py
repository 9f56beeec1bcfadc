"""MXU (int8-matmul) modular DFT prototype — the planned round-4 NTT core.

The butterfly kernels are VPU-compute-bound at ~888M Montgomery muls/s
(ROOFLINE_r03.json); the MXU executes s8 x s8 -> s32 matmuls orders of
magnitude faster.  In the 4-step decomposition every local transform IS a
matmul against the DFT matrix, so the whole transform can ride the MXU:

    X[r] = sum_c W[r, c] * x[c]  (mod p),  W[r, c] = w^(r*c)

Scheme (the "tensor-core NTT" family, adapted to TPU int8 matmuls):
- decompose W and x into D base-2^7 digits (int8; D = 19 for 128-bit
  elements),
- one dot_general per x-digit: [D*n, n] s8 @ [n, B] s8 -> s32, with the
  W-digit axis stacked into the output rows (D dots total instead of D^2),
- bucket the digit-diagonal sums S_k = sum_{i+j=k} Wd_i @ Xd_j
  (max term: D * 127^2 * n < 2^31 for n <= 4096 — no s32 overflow),
- recombine the S_k into 16-bit lazy limbs (shifts + adds), carry-propagate,
- reduce the ~280-bit integer mod p by solinas folding for the reference's
  primary field p128 = 2^128 - 9*2^32 + 1:  hi*2^128 == hi*(9*2^32 - 1).

This module is a standalone correctness + throughput prototype (pinned
against the production transform by tests/test_mxu_ntt.py); wiring it into
the 4-step prover locals is round-4 work.  Values are STANDARD form (not
Montgomery) — the matmul path needs no Montgomery representation at all.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import PrimeField
from ..field.limbs import LIMB_BITS, LIMB_MASK

DIGIT_BITS = 7
_DMASK = np.int32((1 << DIGIT_BITS) - 1)
_M16 = np.uint32(LIMB_MASK)


def _n_digits(bits: int) -> int:
    return -(-bits // DIGIT_BITS)


def digits_from_limbs(limbs: jnp.ndarray, n_digits: int) -> jnp.ndarray:
    """uint32[L, ...] 16-bit limbs -> int8[D, ...] base-2^7 digits."""
    w = limbs[0::2] | (limbs[1::2] << np.uint32(16))      # [L/2, ...] u32
    W = w.shape[0]
    out = []
    for k in range(n_digits):
        bit = k * DIGIT_BITS
        a, off = bit // 32, bit % 32
        lo = w[a] >> np.uint32(off) if a < W else jnp.zeros_like(w[0])
        if off > 32 - DIGIT_BITS and a + 1 < W:
            lo = lo | (w[a + 1] << np.uint32(32 - off))
        out.append((lo.astype(jnp.int32) & _DMASK).astype(jnp.int8))
    return jnp.stack(out)


@lru_cache(maxsize=None)
def _hankel_matrix_digits(field: PrimeField, n: int) -> jnp.ndarray:
    """int8[(2D-1)*n, D*n] block-Hankel arrangement H[(k,r), (j,c)] =
    Wd_{k-j}[r, c] (zero blocks outside 0 <= k-j < D): ONE s8 matmul
    H @ X8_flat yields every digit-diagonal sum S_k at once — the per-digit
    dot formulation writes (2D-1) s32 intermediates per digit pair to HBM
    and reads them back for bucketing, which dominates the runtime (~10 of
    14 ms at n=512); the Hankel dot doubles the MAC count (zero blocks) but
    makes the accumulation free inside the MXU.  Size grows as D^2*n^2 — at
    n > ~1024 use digit-blocked tiles instead (round-4)."""
    W8 = np.asarray(_dft_matrix_digits(field, n))
    D = W8.shape[0]
    H = np.zeros(((2 * D - 1) * n, D * n), dtype=np.int8)
    for k in range(2 * D - 1):
        for j in range(max(0, k - D + 1), min(D, k + 1)):
            H[k * n:(k + 1) * n, j * n:(j + 1) * n] = W8[k - j]
    return jnp.asarray(H)


@lru_cache(maxsize=None)
def _dft_matrix_digits(field: PrimeField, n: int) -> jnp.ndarray:
    """int8[D, n, n]: digit-decomposed DFT matrix W[r, c] = w^(r*c) for the
    canonical size-n root (host-built once per (field, n))."""
    f = field.host
    w = f.get_root_of_unity(n)
    p = field.modulus
    D = _n_digits(field.element_size * 8)
    mat = np.zeros((D, n, n), dtype=np.int8)
    for r in range(n):
        wr = pow(w, r, p)
        cur = 1
        for c in range(n):
            v = cur
            for k in range(D):
                mat[k, r, c] = (v >> (k * DIGIT_BITS)) & int(_DMASK)
            cur = (cur * wr) % p
    return jnp.asarray(mat)


def _propagate(limbs: List[jnp.ndarray], extra: int = 2) -> List[jnp.ndarray]:
    """Lazy u32 limbs (< 2^28 each) -> strict 16-bit limbs; appends `extra`
    limbs to capture the final carry (carry < 2^12 for 2^28 inputs)."""
    out = []
    c = jnp.zeros_like(limbs[0])
    for x in limbs:
        s = x + c
        out.append(s & _M16)
        c = s >> np.uint32(LIMB_BITS)
    for _ in range(extra):
        out.append(c & _M16)
        c = c >> np.uint32(LIMB_BITS)
    return out


def _fold_p128_once(strict: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """One solinas fold on STRICT 16-bit limbs:
    value = lo + hi*9*2^32 - hi  (nonnegative; hi*9*2^32 >= hi).
    No-op (identity) when len <= 8."""
    if len(strict) <= 8:
        return strict
    lo, hi = strict[:8], strict[8:]
    # A = 9*hi << 32 as strict limbs
    A_lazy = [jnp.zeros_like(lo[0])] * 2 + [h * np.uint32(9) for h in hi]
    A = _propagate(A_lazy, extra=1)
    if len(A) < 8:
        A += [jnp.zeros_like(lo[0])] * (8 - len(A))
    # A - hi with borrow chain (integer-nonnegative => final borrow is 0)
    B = hi + [jnp.zeros_like(lo[0])] * (len(A) - len(hi))
    diff = []
    borrow = jnp.zeros_like(lo[0])
    for a, b in zip(A, B):
        s = a - b - borrow
        diff.append(s & _M16)
        borrow = (s >> np.uint32(31)) & np.uint32(1)
    # + lo (lazy), then re-propagate to strict
    for j in range(len(lo)):
        diff[j] = diff[j] + lo[j]
    return _propagate(diff, extra=1)


def _trim(strict: List[jnp.ndarray], field: PrimeField) -> jnp.ndarray:
    """Strict limbs, value < 2p (p = p128) in the low 8 limbs -> canonical
    [8, ...] via two conditional subtracts."""
    out = jnp.stack(strict[:8])
    dev = field.device
    for _ in range(2):
        diff = []
        borrow = jnp.zeros_like(out[0])
        for j in range(8):
            s = out[j] - np.uint32(dev._p_np[j]) - borrow
            diff.append(s & _M16)
            borrow = (s >> np.uint32(31)) & np.uint32(1)
        take = (np.uint32(1) - borrow).astype(jnp.bool_)
        out = jnp.where(take, jnp.stack(diff), out)
    return out


def reduce_p128(field: PrimeField, lazy: List[jnp.ndarray]) -> jnp.ndarray:
    """Lazy 16-bit-limb integer (limbs < 2^28, value < 2^285) -> [8, ...]
    canonical mod p128.

    Bound chain for the fixed fold count: value_0 < 2^285; one fold maps a
    (128+k)-bit value to < 2^128 + 2^(k+35.2), so magnitudes go
    2^285 -> 2^192.2 -> 2^99.4+2^128 -> hi <= 1 -> < 2^128 + 2^36 ->
    < 2^128 (or < 2^37), i.e. FIVE folds always land strictly below 2^129
    with the low 8 limbs < 2p — two conditional subtracts finish."""
    strict = _propagate(lazy, extra=2)
    for _ in range(5):
        strict = _fold_p128_once(strict)
    return _trim(strict, field)


def mxu_dft(field: PrimeField, x_std: jnp.ndarray, n: int) -> jnp.ndarray:
    """Size-n DFT over the canonical root via int8 MXU matmuls.

    x_std: uint32[L, n, B] standard-form 16-bit limbs (B batch columns).
    Returns uint32[L, n, B] standard-form.  p128 only (solinas reduction).
    """
    assert field.element_size == 16, "prototype supports the 128-bit field"
    D = _n_digits(128)
    L, n_in, B = x_std.shape
    assert n_in == n
    X8 = digits_from_limbs(x_std, D)                   # [D, n, B] int8
    n_k = 2 * D - 1

    if D * n <= (1 << 14):
        # single block-Hankel dot: every S_k in one matmul, no s32
        # intermediate round-trips (see _hankel_matrix_digits)
        H = _hankel_matrix_digits(field, n)
        prod = jax.lax.dot_general(
            H, X8.reshape(D * n, B), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # [(2D-1)*n, B]
        prod = prod.reshape(n_k, n, B)
        acc = [prod[k] for k in range(n_k)]
    else:
        # digit-blocked fallback: D dots of [D*n, n] @ [n, B]
        W8 = _dft_matrix_digits(field, n)              # [D, n, n] int8
        Wflat = W8.reshape(D * n, n)
        acc = [None] * n_k
        for j in range(D):
            prod = jax.lax.dot_general(
                Wflat, X8[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # [D*n, B]
            prod = prod.reshape(D, n, B)
            for i in range(D):
                k = i + j
                acc[k] = prod[i] if acc[k] is None else acc[k] + prod[i]

    # recombine: value = sum_k S_k * 2^(7k) -> lazy 16-bit limbs
    total_bits = DIGIT_BITS * (n_k - 1) + 36
    n_limbs = -(-total_bits // LIMB_BITS) + 1
    limbs = [jnp.zeros((n, B), dtype=jnp.uint32) for _ in range(n_limbs)]
    for k in range(n_k):
        a = acc[k].astype(jnp.uint32)                  # < 2^31
        lo = a & _M16
        hi = a >> np.uint32(LIMB_BITS)                 # < 2^15
        for part, extra_bits in ((lo, 0), (hi, LIMB_BITS)):
            bit = k * DIGIT_BITS + extra_bits
            pidx, off = bit // LIMB_BITS, bit % LIMB_BITS
            sh = part << np.uint32(off)                # <= 31 bits
            limbs[pidx] = limbs[pidx] + (sh & _M16)
            limbs[pidx + 1] = limbs[pidx + 1] + (sh >> np.uint32(LIMB_BITS))

    return reduce_p128(field, limbs)
