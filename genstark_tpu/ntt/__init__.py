"""NTT / iNTT over multiplicative subgroups — the north-star kernel layer.

Replaces galois's WASM `interpolateRoots` / `evalPolysAtRoots` /
`evalPolyAtRoots` (used at /root/reference/lib/Stark.ts:106-109 and
/root/reference/lib/components/CompositionPolynomial.ts:109-110).

Design: iterative radix-2 Cooley-Tukey (decimation in time) over the limb
representation, with ALL stage indexing computed inside a `lax.fori_loop`
from the stage counter (pure bit arithmetic on an iota) — no per-stage
reshapes and no uploaded index tables.  One tiny compiled program per
(field, size, direction): on the tunnelled-TPU backend the dominant
one-time cost is per-program executable size (compile + transfer), and the
steady-state cost is per-dispatch round-trips, so a whole transform must be
a single small program.

The only materialized table is the twiddle half-table [L, n/2] (computed on
device by a log-doubling power series — never uploaded).  Butterflies are
expressed as three gathers along the lane axis (lo/hi pick, inverse-shuffle
write-back), which keeps every stage shape-invariant at [L, B, n].

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


class NttPlan:
    """Cached twiddle table for one (field, size, direction)."""

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


@lru_cache(maxsize=None)
def _use_pallas() -> bool:
    """Pallas butterfly kernels on real TPUs; pure-jnp elsewhere (CPU tests
    run the same math without Mosaic).  GENSTARK_NO_PALLAS=1 disables."""
    import os
    if os.environ.get("GENSTARK_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def _bitrev_indices(n: int) -> jnp.ndarray:
    """Bit-reversal permutation of 0..n-1, computed on device from an iota
    (nothing host-built is uploaded)."""
    bits = n.bit_length() - 1
    idx = jax.lax.iota(jnp.int32, n)
    rev = jnp.zeros_like(idx)
    for b in range(bits):
        rev = rev | (((idx >> b) & 1) << (bits - 1 - b))
    return rev


def _ntt_core(field: PrimeField, a: jnp.ndarray, plan) -> jnp.ndarray:
    """Plan-based wrapper over ntt_core_table (kept for callers that hold an
    NttPlan, e.g. the distributed transforms)."""
    return ntt_core_table(field, a, plan.n, plan.w_table)


def ntt_core_table(field: PrimeField, a: jnp.ndarray, n: int,
                   w_table: jnp.ndarray) -> jnp.ndarray:
    """Core transform. a: [..., L, n] (Montgomery). Returns same shape.
    w_table: [L, n/2] twiddle half-table (Montgomery) — may be a traced
    argument (the fused prover passes power tables as program parameters so
    they are never baked into executables as literals).

    The log2(n) butterfly stages are unrolled with reshape-paired operands:
    stage with half-size m views the data as [L, B, n/2m, 2, m] so every
    butterfly is a large contiguous elementwise Montgomery op on the VPU.
    (A fori_loop formulation with gather-derived lo/hi indexing compiles to
    a far smaller program but runs ~100x slower — dynamic gathers along the
    lane axis defeat TPU vectorization; measured 13.7M butterflies/s vs
    >1B/s for this form.)  Per-stage twiddles are picked from the half-table
    by reshape+slice (a strided slice at large stride OOMs scoped VMEM).
    """
    dev = field.device
    if n == 1:
        return a
    S = n.bit_length() - 1
    batch_shape = a.shape[:-2]
    L = a.shape[-2]
    # normalize to [L, B, n]
    x = a.reshape((-1, L, n)) if batch_shape else a[None]
    x = jnp.swapaxes(x, 0, 1)                                   # [L, B, n]
    x = jnp.take(x, _bitrev_indices(n), axis=-1)
    B = x.shape[1]

    half = n // 2
    if _use_pallas():
        # pallas path: all stages with m <= _MBLK in one multi-stage VMEM
        # kernel, the remaining large-m stages as split-operand kernels
        from .pallas_kernels import butterfly_stage2, multistage
        x2 = jnp.swapaxes(x, 0, 1).reshape(B * L, n)  # batch-major limb rows
        x2, last_m = multistage(field, x2, w_table, L, n)
        m = last_m * 2
        while m < n:
            stride = half // m
            g = n // (2 * m)
            tw = w_table.reshape(L, m, stride)[:, :, 0]
            twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)
            x2 = butterfly_stage2(field, x2, twf, L, n, m)
            m *= 2
        x = x2.reshape(B, L, n)                                 # [B, L, n]
        return x.reshape(batch_shape + (L, n)) if batch_shape else x[0]

    m = 1
    while m < n:
        stride = half // m
        g = n // (2 * m)
        # w_table[:, ::stride][:, :m] without a strided slice:
        tw = w_table.reshape(L, m, stride)[:, :, 0]             # [L, m]
        twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)
        y = x.reshape(L, B, g, 2, m)
        # flatten operands to [L, B, n/2] so the elementwise Montgomery
        # ops always see a huge minor dimension
        lo = y[:, :, :, 0, :].reshape(L, B, half)
        hi = y[:, :, :, 1, :].reshape(L, B, half)
        t = dev.mont_mul(hi, twf[:, None, :])
        new_lo = dev._add(lo, t)
        new_hi = dev._sub(lo, t)
        x = jnp.stack([new_lo.reshape(L, B, g, m),
                       new_hi.reshape(L, B, g, m)], axis=-2).reshape(L, B, n)
        m *= 2

    x = jnp.swapaxes(x, 0, 1)                                   # [B, L, n]
    return x.reshape(batch_shape + (L, n)) if batch_shape else x[0]


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
