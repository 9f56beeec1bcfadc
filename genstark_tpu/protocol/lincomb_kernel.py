"""One fused Pallas kernel for the composition/linear-combination pointwise
tail (protocol/fused.py _lcomb_chunked body).

The tail is ~12 full-domain Montgomery passes (domain-power regeneration,
Z(x)^-1, the qe*Z^-1 product, boundary/trace degree raises and the two
random linear combinations) — as separate tile kernels each pays a full
HBM read+write of [L, Ne] (~1.5 GB per pass at Ne = 2^24; measured ~150 ms
of elementwise + outer-table kernels in the 2^20 proof's lcomb stage).
Here the whole tail runs as ONE kernel: each 2048-lane tile reads qe, the
boundary vectors and the committed evaluation vectors once, does every
multiply in VMEM, and writes the combined vector once.

Math per position x (identical to the unfused path, which remains the
fallback and the CPU/mesh path):

    dom      = outer[pos//s] * inner[pos%s]          (factored power table)
    zinv     = (dom - x_last) * inv_series[pos%ext]  (ZeroPolynomial)
    acc      = qe * zinv                             (D(x) = Q(x)/Z(x))
    incr     = outer_i[pos//s] * inner_i[pos%s]      (x^(target-T), optional)
    acc     += sum_b  b_k * b_coeff_k   (+ b_k*incr * b_coeff_{B+k})
    acc     += sum_v  e_std_v * l_coeff_v (+ e_std_v*incr * l_coeff_{V+v})

Representation contract (the std-form pipeline, protocol/fused.py): qe and
e_std are STANDARD form, the boundary vectors / power tables / l_coeffs are
Montgomery, b_coeffs are standard — every additive term therefore lands in
standard form and the output feeds the FRI chain with no conversion pass.

`digest parity`: every operation is the same canonical-form limb math the
elementwise kernels run (ntt.pallas_kernels), so proof bytes cannot depend
on which path executed — pinned by tests/test_lcomb_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ntt.pallas_kernels import _add_mod, _mont_mul_limbs, _sub_mod

_TC = 2048


@functools.lru_cache(maxsize=None)
def _tail_call(L: int, Ne: int, B: int, V: int, sT: int, tc: int,
               has_incr: bool, b_inc: bool, ps_inc: bool,
               p_limbs_bytes: bytes, x_last_bytes: bytes,
               n0p_int: int, interpret: bool):
    from jax.experimental import pallas as pl

    p_limbs = np.frombuffer(p_limbs_bytes, dtype=np.uint32)
    x_last = np.frombuffer(x_last_bytes, dtype=np.uint32)
    n0p = np.uint32(n0p_int)

    def mul(a, b):
        return _mont_mul_limbs(a, b, p_limbs, n0p)

    def kernel(*refs):
        it = iter(refs)
        qe_ref = next(it)
        b_ref = next(it) if B else None
        e_ref = next(it)
        do_ref, di_ref = next(it), next(it)
        io_ref = ii_ref = None
        if has_incr:
            io_ref, ii_ref = next(it), next(it)
        inv_ref = next(it)
        bc_ref = next(it) if B else None
        lc_ref = next(it)
        out_ref = next(it)

        def rows(ref):                       # [L, TC] ref -> limb list
            return [ref[i] for i in range(L)]

        def bcast(ref):                      # [1, L, 1] outer -> limb list
            return [jnp.broadcast_to(ref[0, i], qe_ref[0].shape)
                    for i in range(L)]

        def col(ref, k):                     # [L, K] ref -> [L, 1]-ish list
            return [jnp.broadcast_to(ref[i, k:k + 1], qe_ref[0].shape)
                    for i in range(L)]

        consts = lambda arr: [jnp.full_like(qe_ref[0], arr[i])
                              for i in range(L)]
        dom = mul(bcast(do_ref), rows(di_ref))
        zinv = mul(_sub_mod(dom, consts(x_last), p_limbs), rows(inv_ref))
        acc = mul(rows(qe_ref), zinv)
        incr = None
        if has_incr:
            incr = mul(bcast(io_ref), rows(ii_ref))
        for k in range(B):
            bk = [b_ref[k, i] for i in range(L)]
            acc = _add_mod(acc, mul(bk, col(bc_ref, k)), p_limbs)
        if b_inc:
            for k in range(B):
                bk = [b_ref[k, i] for i in range(L)]
                acc = _add_mod(acc, mul(mul(bk, incr), col(bc_ref, B + k)),
                               p_limbs)
        for v in range(V):
            # e rows are STANDARD form; lc coefficients are Montgomery, so
            # each product lands in standard form directly (no to-Montgomery)
            pv = [e_ref[v, i] for i in range(L)]
            acc = _add_mod(acc, mul(pv, col(lc_ref, v)), p_limbs)
            if ps_inc:
                acc = _add_mod(acc, mul(mul(pv, incr), col(lc_ref, V + v)),
                               p_limbs)
        out_ref[...] = jnp.stack(acc)

    grid = (Ne // tc,)
    nb = B * (2 if b_inc else 1)
    nl = V * (2 if ps_inc else 1)
    in_specs = [pl.BlockSpec((L, tc), lambda c: (0, c))]
    if B:
        in_specs.append(pl.BlockSpec((B, L, tc), lambda c: (0, 0, c)))
    in_specs.append(pl.BlockSpec((V, L, tc), lambda c: (0, 0, c)))
    # factored tables: outer [nj, L, 1] (block-1 leading j select), inner
    # [L, s] with s = sT * _TC (tile c covers inner offset (c % sT) * _TC)
    in_specs.append(pl.BlockSpec((1, L, 1),
                                 lambda c: (jax.lax.div(c, sT), 0, 0)))
    in_specs.append(pl.BlockSpec((L, tc), lambda c: (0, jax.lax.rem(c, sT))))
    if has_incr:
        in_specs.append(pl.BlockSpec((1, L, 1),
                                     lambda c: (jax.lax.div(c, sT), 0, 0)))
        in_specs.append(pl.BlockSpec((L, tc),
                                     lambda c: (0, jax.lax.rem(c, sT))))
    in_specs.append(pl.BlockSpec((L, tc), lambda c: (0, 0)))   # inv tiled
    if B:
        in_specs.append(pl.BlockSpec((L, nb), lambda c: (0, 0)))
    in_specs.append(pl.BlockSpec((L, nl), lambda c: (0, 0)))
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, Ne), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, tc), lambda c: (0, c)),
        interpret=interpret,
    )
    return jax.jit(call)


def lcomb_tail(dev, qe, b_stack, e_std, dom_parts, incr_parts, inv_series,
               x_last_int: int, b_coeffs, l_coeffs, b_inc: bool,
               ps_inc: bool, ext: int, interpret: bool = False):
    """Fused tail over [L, Ne] arrays, or None when the shapes don't fit
    the kernel's tiling (caller falls back to the unfused ops).

    dom_parts/incr_parts: (outer [L, nj], inner [L, s]) factored tables;
    inv_series: [L, ext] inverted Z-numerator period; b_coeffs [L, nb]
    standard-form, l_coeffs [L, nl] Montgomery transcript coefficients
    (see the module docstring's representation contract)."""
    L, Ne = qe.shape
    if L < 8:
        return None          # Mosaic blocks need >= 8 sublanes (p32: L=2)
    s = dom_parts[1].shape[1]
    tc = min(_TC, s)
    if tc % 256 or Ne % tc or tc % ext or s % tc:
        return None
    if incr_parts is not None and incr_parts[1].shape[1] != s:
        return None
    B = b_stack.shape[0]
    V = e_std.shape[0]
    if b_coeffs.shape[1] != B * (2 if b_inc else 1) or \
            l_coeffs.shape[1] != V * (2 if ps_inc else 1):
        return None
    if (b_inc or ps_inc) and incr_parts is None:
        return None
    sT = s // tc
    outer_t = jnp.transpose(dom_parts[0], (1, 0))[:, :, None]   # [nj, L, 1]
    args = [qe]
    if B:
        args.append(b_stack)
    args.append(e_std)
    args += [outer_t, dom_parts[1]]
    if incr_parts is not None:
        args += [jnp.transpose(incr_parts[0], (1, 0))[:, :, None],
                 incr_parts[1]]
    args.append(jnp.tile(inv_series, (1, tc // ext)))
    if B:
        args.append(b_coeffs)
    args.append(l_coeffs)
    x_last_mont = (x_last_int * dev.params.R_mod) % dev.p
    from ..field.limbs import int_to_limbs
    fn = _tail_call(L, Ne, B, V, sT, tc, incr_parts is not None, b_inc, ps_inc,
                    dev._p_np.tobytes(),
                    np.asarray(int_to_limbs(x_last_mont, L),
                               dtype=np.uint32).tobytes(),
                    int(dev._n0p), interpret)
    return fn(*args)
