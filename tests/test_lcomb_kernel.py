"""Fused lincomb-tail Pallas kernel (protocol/lincomb_kernel.py) vs the
unfused DeviceField formulation — must be bit-identical (the kernel runs
the same canonical-form limb math in VMEM; the unfused ops remain the
CPU/mesh path and the fallback)."""

import random

import numpy as np
import pytest

from genstark_tpu.field import P128, create_prime_field


def test_lcomb_tail_matches_unfused():
    import jax.numpy as jnp
    from genstark_tpu.protocol.lincomb_kernel import lcomb_tail

    field = create_prime_field(P128)
    dev = field.device
    f = field.host
    p = field.modulus
    L = dev.L
    Ne, s, ext = 4096, 2048, 16
    nj = Ne // s
    B, V = 2, 3
    rng = random.Random(5)

    import jax.numpy as _jnp

    qe = dev.from_ints([rng.randrange(p) for _ in range(Ne)])  # [L, Ne] mont
    b_stack = _jnp.stack([dev.from_ints(
        [rng.randrange(p) for _ in range(Ne)]) for _ in range(B)])
    e_std = _jnp.stack([dev.from_ints(
        [rng.randrange(p) for _ in range(Ne)], to_mont=False)
        for _ in range(V)])                              # [V, L, Ne] std
    g = f.exp(3, (p - 1) // (4 * Ne))                    # some element
    dom_outer = dev.power_series(f.exp(g, s), nj)        # [L, nj]
    dom_inner = dev.power_series(g, s)                   # [L, s]
    h = f.exp(7, (p - 1) // (4 * Ne))
    incr_outer = dev.power_series(f.exp(h, s), nj)
    incr_inner = dev.power_series(h, s)
    inv_series = dev.from_ints([rng.randrange(1, p) for _ in range(ext)])
    x_last = rng.randrange(1, p)
    b_coeffs = dev.from_ints([rng.randrange(p) for _ in range(2 * B)])
    l_coeffs = dev.from_ints([rng.randrange(p) for _ in range(2 * V)])

    out = lcomb_tail(dev, qe, b_stack, e_std, (dom_outer, dom_inner),
                     (incr_outer, incr_inner), inv_series, x_last,
                     b_coeffs, l_coeffs, True, True, ext, interpret=True)
    assert out is not None

    # unfused reference (same ops the chunked body uses)
    dom = dev.outer_table(dom_outer, dom_inner)
    incr = dev.outer_table(incr_outer, incr_inner)
    zinv = dev.mont_mul(dev._sub(dom, dev.const(x_last, shape=(1,))),
                        jnp.tile(inv_series, (1, Ne // ext)))
    acc = dev.mont_mul(qe, zinv)
    ba = [b_stack[k] for k in range(B)]
    ba += [dev.mont_mul(v, incr) for v in ba[:B]]
    acc = dev._add(acc, dev.combine_many_mont(ba, b_coeffs))
    # std-form contract: e rows multiply the l-coefficients directly
    ps = [e_std[v] for v in range(V)]
    ps += [dev.mont_mul(v, incr) for v in ps[:V]]
    expected = dev._add(acc, dev.combine_many_mont(ps, l_coeffs))
    assert np.array_equal(np.asarray(out), np.asarray(expected))


def test_lcomb_tail_no_incr_no_boundary():
    import jax.numpy as jnp
    from genstark_tpu.protocol.lincomb_kernel import lcomb_tail

    field = create_prime_field(P128)
    dev = field.device
    f = field.host
    p = field.modulus
    L = dev.L
    Ne, s, ext = 2048, 2048, 8
    rng = random.Random(9)
    qe = dev.from_ints([rng.randrange(p) for _ in range(Ne)])
    e_std = dev.from_ints([rng.randrange(p) for _ in range(Ne)],
                          to_mont=False)[None]           # [1, L, Ne]
    b_stack = jnp.zeros((0, L, Ne), dtype=jnp.uint32)
    g = f.exp(5, (p - 1) // (2 * Ne))
    dom_outer = dev.power_series(f.exp(g, s), Ne // s)
    dom_inner = dev.power_series(g, s)
    inv_series = dev.from_ints([rng.randrange(1, p) for _ in range(ext)])
    x_last = rng.randrange(1, p)
    b_coeffs = jnp.zeros((L, 0), dtype=jnp.uint32)
    l_coeffs = dev.from_ints([rng.randrange(p)])
    out = lcomb_tail(dev, qe, b_stack, e_std, (dom_outer, dom_inner),
                     None, inv_series, x_last, b_coeffs, l_coeffs,
                     False, False, ext, interpret=True)
    assert out is not None
    dom = dev.outer_table(dom_outer, dom_inner)
    zinv = dev.mont_mul(dev._sub(dom, dev.const(x_last, shape=(1,))),
                        jnp.tile(inv_series, (1, Ne // ext)))
    acc = dev.mont_mul(qe, zinv)
    expected = dev._add(acc, dev.combine_many_mont([e_std[0]], l_coeffs))
    assert np.array_equal(np.asarray(out), np.asarray(expected))
