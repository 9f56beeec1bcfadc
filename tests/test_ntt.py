"""NTT layer tests: device transforms vs host oracle."""

import random

import pytest

from genstark_tpu.field import P32, P128, create_prime_field
from genstark_tpu import ntt


@pytest.mark.parametrize("p", [P32, P128])
@pytest.mark.parametrize("n", [2, 8, 64, 1024])
def test_ntt_matches_host(p, n):
    rng = random.Random(n)
    f = create_prime_field(p)
    coeffs = [rng.randrange(p) for _ in range(n)]
    d = f.device.from_ints(coeffs)
    got = f.device.to_ints(ntt.ntt(f, d))
    assert got == f.host.eval_poly_at_roots(coeffs, n)


@pytest.mark.parametrize("p", [P32, P128])
def test_intt_roundtrip(p):
    rng = random.Random(3)
    f = create_prime_field(p)
    n = 256
    vals = [rng.randrange(p) for _ in range(n)]
    d = f.device.from_ints(vals)
    coeffs = ntt.intt(f, d)
    back = f.device.to_ints(ntt.ntt(f, coeffs))
    assert back == vals


def test_batched_ntt():
    rng = random.Random(4)
    f = create_prime_field(P128)
    import jax.numpy as jnp
    n, B = 64, 3
    polys = [[rng.randrange(P128) for _ in range(n)] for _ in range(B)]
    d = jnp.stack([f.device.from_ints(pl) for pl in polys])  # [B, L, n]
    got = ntt.ntt(f, d)
    for b in range(B):
        assert f.device.to_ints(got[b]) == f.host.eval_poly_at_roots(polys[b], n)


def test_low_degree_extend_consistency():
    rng = random.Random(5)
    f = create_prime_field(P32)
    T, ext = 32, 8
    trace = [rng.randrange(P32) for _ in range(T)]
    coeffs = ntt.intt(f, f.device.from_ints(trace))
    lde = f.device.to_ints(ntt.low_degree_extend(f, coeffs, T * ext))
    assert lde[::ext] == trace
