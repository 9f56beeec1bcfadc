"""Pallas TPU kernels for elementwise Montgomery field ops on limb arrays.

The jnp formulation in DeviceField (device.py) builds a [2L+1, N] lazy
accumulator array: correct and CPU-compile-friendly, but on TPU every
pad+add round-trips the ~2x-element-size accumulator through HBM — a single
full-domain mont_mul at N = 2^21 measures ~22 ms (~17 GB of traffic).
These kernels run the identical limb math (pallas_kernels._mont_mul_limbs
et al) on VMEM tiles: one read of each operand, one write of the result,
~50x less traffic.  They replace the reference's WASM batch field ops
(`mulVectorElements` and friends, consumed throughout
/root/reference/lib/components/).

Dispatch contract (DeviceField._pallas_elementwise): TPU backend only, the
flattened batch N a multiple of the 2048-lane tile, second operand either
same-shape or a [L, 1] broadcast scalar; anything else falls back to the
jnp path — the math is identical either way (both reduce to canonical
form), so routing is purely a performance decision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ntt.pallas_kernels import _add_mod, _mont_mul_limbs, _sub_mod

_TC = 2048


@functools.lru_cache(maxsize=None)
def _ew_call(op: str, L: int, N: int, b_scalar: bool, p_limbs_bytes: bytes,
             n0p_int: int, interpret: bool):
    from jax.experimental import pallas as pl

    p_limbs = np.frombuffer(p_limbs_bytes, dtype=np.uint32)
    n0p = np.uint32(n0p_int)

    def kernel(a_ref, b_ref, out_ref):
        al = [a_ref[i] for i in range(L)]
        if b_scalar:
            bl = [jnp.broadcast_to(b_ref[i], a_ref[i].shape) for i in range(L)]
        else:
            bl = [b_ref[i] for i in range(L)]
        if op == "mul":
            res = _mont_mul_limbs(al, bl, p_limbs, n0p)
        elif op == "add":
            res = _add_mod(al, bl, p_limbs)
        else:
            res = _sub_mod(al, bl, p_limbs)
        out_ref[...] = jnp.stack(res)

    b_spec = (pl.BlockSpec((L, 1), lambda i: (0, 0)) if b_scalar
              else pl.BlockSpec((L, _TC), lambda i: (0, i)))
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=(N // _TC,),
        in_specs=[pl.BlockSpec((L, _TC), lambda i: (0, i)), b_spec],
        out_specs=pl.BlockSpec((L, _TC), lambda i: (0, i)),
        interpret=interpret,
    )
    return jax.jit(call)


def elementwise(dev, op: str, a2: jnp.ndarray, b2: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """op in {mul, add, sub} on [L, N] limb arrays (b2: [L, N] or [L, 1])."""
    L, N = a2.shape
    assert N % _TC == 0, "caller must guarantee tile-aligned batch"
    b_scalar = b2.shape[1] == 1
    return _ew_call(op, L, N, b_scalar, dev._p_np.tobytes(), int(dev._n0p),
                    interpret)(a2, b2)


@functools.lru_cache(maxsize=None)
def _outer_call(L: int, nj: int, s: int, p_limbs_bytes: bytes, n0p_int: int,
                interpret: bool):
    """Factored power-table regeneration t[j*s + k] = outer[j] * inner[k]
    as one kernel: the jnp broadcast formulation pays the full accumulator-
    array traffic on the [L, nj, s] result (~22 ms per full-domain table).
    outer is passed [nj, L, 1] (leading-dim j select, see ntt/mxu.py)."""
    from jax.experimental import pallas as pl

    p_limbs = np.frombuffer(p_limbs_bytes, dtype=np.uint32)
    n0p = np.uint32(n0p_int)

    def kernel(o_ref, i_ref, out_ref):
        ol = [jnp.broadcast_to(o_ref[0, i], i_ref[i].shape) for i in range(L)]
        il = [i_ref[i] for i in range(L)]
        out_ref[...] = jnp.stack(_mont_mul_limbs(ol, il, p_limbs, n0p))

    # one j per grid step: tile width = s (the inner series length)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, nj * s), jnp.uint32),
        grid=(nj,),
        in_specs=[pl.BlockSpec((1, L, 1), lambda i: (i, 0, 0)),
                  pl.BlockSpec((L, s), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((L, s), lambda i: (0, i)),
        interpret=interpret,
    )
    return jax.jit(call)


def outer_product_table(dev, outer: jnp.ndarray, inner: jnp.ndarray,
                        interpret: bool = False):
    """[L, nj] x [L, s] -> [L, nj*s] Montgomery outer product
    (t[j*s + k] = outer[j]*inner[k]), or None when the shapes don't fit the
    kernel's tiling (caller falls back to the jnp broadcast)."""
    L, nj = outer.shape
    s = inner.shape[1]
    if s < 256 or s % 128 or s > 8192:
        return None
    outer_t = jnp.transpose(outer, (1, 0))[:, :, None]      # [nj, L, 1]
    return _outer_call(L, nj, s, dev._p_np.tobytes(), int(dev._n0p),
                       interpret)(outer_t, inner)
