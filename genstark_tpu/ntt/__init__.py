"""NTT / iNTT over multiplicative subgroups — the north-star kernel layer.

Replaces galois's WASM `interpolateRoots` / `evalPolysAtRoots` /
`evalPolyAtRoots` (used at /root/reference/lib/Stark.ts:106-109 and
/root/reference/lib/components/CompositionPolynomial.ts:109-110).

Design: iterative radix-2 Cooley-Tukey (decimation in time) over the limb
representation.  Input is permuted to bit-reversed order (static gather),
then log2(N) butterfly stages run as fully vectorized Montgomery mul/add/sub
over [L, N/2] slabs.  Twiddle tables are computed once per (field, N) with a
log-doubling power series and cached on device.

A batched variant transforms R polynomials at once ([R, L, N]) by folding the
register axis into the batch, which is how trace matrices are interpolated /
extended in one shot.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field import PrimeField


@lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class NttPlan:
    """Cached twiddles + permutation for one (field, size, direction)."""

    def __init__(self, field: PrimeField, n: int, inverse: bool):
        self.field = field
        self.n = n
        self.inverse = inverse
        w = field.get_root_of_unity(n)
        if inverse:
            w = field.inv(w)
        self.w = w
        # full half-table of twiddles [L, n/2] in Montgomery form (device)
        if n >= 2:
            self.w_table = field.device.power_series(w, n // 2)
        else:
            self.w_table = field.device.power_series(1, 1)
        self.perm = jnp.asarray(_bitrev_perm(n))
        if inverse:
            self.n_inv = field.inv(n % field.modulus)


@lru_cache(maxsize=None)
def get_plan(field: PrimeField, n: int, inverse: bool) -> NttPlan:
    return NttPlan(field, n, inverse)


@lru_cache(maxsize=None)
def _jitted_transform(field: PrimeField, n: int, inverse: bool):
    """Whole-transform jit (cached per field/size/direction); jax re-traces
    per batch shape automatically."""
    plan = get_plan(field, n, inverse)

    def run(a):
        out = _ntt_core(field, a, plan)
        if inverse:
            dev = field.device
            n_inv = dev.const(plan.n_inv, shape=(1,))
            if out.ndim == 2:
                return dev.mont_mul(out, n_inv)
            moved = jnp.moveaxis(out, -2, 0)
            scaled = dev.mont_mul(moved, n_inv)
            return jnp.moveaxis(scaled, 0, -2)
        return out

    return jax.jit(run)


def _ntt_core(field: PrimeField, a: jnp.ndarray, plan: NttPlan) -> jnp.ndarray:
    """Core transform. a: [..., L, n] (Montgomery). Returns same shape.

    Leading axes are batch. Butterflies keep the pair axis adjacent so XLA
    sees large contiguous vector ops.
    """
    dev = field.device
    n = plan.n
    if n == 1:
        return a
    batch_shape = a.shape[:-2]
    L = a.shape[-2]
    # gather to bit-reversed order along the last axis
    a = jnp.take(a, plan.perm, axis=-1)
    m = 1
    while m < n:
        stride = n // (2 * m)
        tw = plan.w_table[:, ::stride][:, :m]              # [L, m]
        a = a.reshape(batch_shape + (L, n // (2 * m), 2, m))
        lo = a[..., 0, :]
        hi = a[..., 1, :]
        # move L next to the elementwise dims for dev ops: dev expects [L, ...]
        lo_m = jnp.moveaxis(lo, -3, 0) if lo.ndim > 2 else lo
        hi_m = jnp.moveaxis(hi, -3, 0) if hi.ndim > 2 else hi
        twb = tw.reshape((L,) + (1,) * (lo_m.ndim - 2) + (m,))
        t = dev.mont_mul(hi_m, twb)
        new_lo = dev.add(lo_m, t)
        new_hi = dev.sub(lo_m, t)
        lo = jnp.moveaxis(new_lo, 0, -3) if lo.ndim > 2 else new_lo
        hi = jnp.moveaxis(new_hi, 0, -3) if hi.ndim > 2 else new_hi
        a = jnp.stack([lo, hi], axis=-2)
        m *= 2
    return a.reshape(batch_shape + (L, n))


def ntt(field: PrimeField, values: jnp.ndarray, n: Optional[int] = None) -> jnp.ndarray:
    """Forward NTT: evaluations of the polynomial (coeffs=values) at the
    powers of the canonical n-th root of unity.  values: [L, n] or [B, L, n]."""
    n = n or values.shape[-1]
    return _jitted_transform(field, n, False)(values)


def intt(field: PrimeField, values: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: interpolation over the canonical domain (galois
    `interpolateRoots`).  Scales by n^-1."""
    n = values.shape[-1]
    return _jitted_transform(field, n, True)(values)


def low_degree_extend(field: PrimeField, coeffs: jnp.ndarray, target_n: int) -> jnp.ndarray:
    """Evaluate polynomial(s) given by coeffs [..., L, n] over the canonical
    domain of size target_n >= n (galois `evalPolysAtRoots` on a larger
    domain, i.e. the LDE step at /root/reference/lib/Stark.ts:109)."""
    src_n = coeffs.shape[-1]
    if target_n < src_n:
        raise ValueError("target domain smaller than coefficient count")
    if target_n > src_n:
        pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, target_n - src_n)]
        coeffs = jnp.pad(coeffs, pad)
    return ntt(field, coeffs, target_n)
