"""Field layer tests: device Montgomery kernels vs the host python-int oracle.

Mirrors the reference's oracle-test pattern (SURVEY.md section 4): independent
plain implementations checked bit-exactly against the optimized path.
"""

import random

import numpy as np
import pytest

from genstark_tpu.field import P32, P64, P128, P224, P256, create_prime_field

FIELDS = [P32, P64, P128, P224, P256, 96769]


def _rand_elems(rng, p, n):
    return [rng.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("p", FIELDS)
def test_roundtrip(p):
    rng = random.Random(1)
    f = create_prime_field(p)
    vals = _rand_elems(rng, p, 64) + [0, 1, p - 1]
    arr = f.device.from_ints(vals)
    assert f.device.to_ints(arr) == vals


@pytest.mark.parametrize("p", FIELDS)
def test_add_sub_mul(p):
    rng = random.Random(2)
    f = create_prime_field(p)
    n = 128
    a = _rand_elems(rng, p, n)
    b = _rand_elems(rng, p, n)
    da, db = f.device.from_ints(a), f.device.from_ints(b)
    assert f.device.to_ints(f.device.add(da, db)) == [(x + y) % p for x, y in zip(a, b)]
    assert f.device.to_ints(f.device.sub(da, db)) == [(x - y) % p for x, y in zip(a, b)]
    assert f.device.to_ints(f.device.mul(da, db)) == [(x * y) % p for x, y in zip(a, b)]
    assert f.device.to_ints(f.device.neg(da)) == [(-x) % p for x in a]


@pytest.mark.parametrize("p", [P32, P128, P256])
def test_exp_inv(p):
    rng = random.Random(3)
    f = create_prime_field(p)
    a = _rand_elems(rng, p, 16)
    da = f.device.from_ints(a)
    for e in [0, 1, 2, 3, 5, 65537]:
        assert f.device.to_ints(f.device.exp_static(da, e)) == [pow(x, e, p) for x in a]
    if p.bit_length() > 128:
        # the Fermat ladder compiles a p-bit square-multiply chain — minutes
        # of XLA:CPU compile for the wide fields; covered by the slow test
        return
    # Fermat inversion (scan ladder path)
    inv = f.device.to_ints(f.device.inv(da))
    for x, ix in zip(a, inv):
        if x == 0:
            assert ix == 0
        else:
            assert (x * ix) % p == 1


@pytest.mark.slow
@pytest.mark.parametrize("p", [P224, P256])
def test_inv_wide_fields(p):
    rng = random.Random(3)
    f = create_prime_field(p)
    a = _rand_elems(rng, p, 16)
    inv = f.device.to_ints(f.device.inv(f.device.from_ints(a)))
    for x, ix in zip(a, inv):
        assert (x * ix) % p == (1 if x else 0)


@pytest.mark.parametrize("p", [P32, P128])
def test_power_series(p):
    f = create_prime_field(p)
    w = f.get_root_of_unity(64)
    dev = f.device.to_ints(f.device.power_series(w, 100))
    host = f.get_power_series(w, 100)
    assert dev == host


@pytest.mark.parametrize("p", [P32, P128])
def test_combine_many(p):
    rng = random.Random(4)
    f = create_prime_field(p)
    K, n = 5, 32
    vecs = [_rand_elems(rng, p, n) for _ in range(K)]
    coeffs = _rand_elems(rng, p, K)
    dvecs = [f.device.from_ints(v) for v in vecs]
    got = f.device.to_ints(f.device.combine_many(dvecs, coeffs))
    want = [sum(coeffs[k] * vecs[k][i] for k in range(K)) % p for i in range(n)]
    assert got == want


def test_roots_of_unity():
    for p in [P32, P64, P128, P224, P256]:
        f = create_prime_field(p)
        for logn in [1, 4, 10]:
            n = 1 << logn
            w = f.get_root_of_unity(n)
            assert pow(w, n, p) == 1
            assert pow(w, n // 2, p) == p - 1


def test_host_poly_ops():
    f = create_prime_field(P32)
    h = f.host
    xs = [3, 7, 11, 19]
    ys = [1, 2, 4, 8]
    poly = h.interpolate(xs, ys)
    for x, y in zip(xs, ys):
        assert h.eval_poly_at(poly, x) == y
    # interpolate_roots round trip
    vals = [5, 6, 7, 8, 9, 10, 11, 12]
    coeffs = h.interpolate_roots(vals)
    assert h.eval_poly_at_roots(coeffs, 8) == vals
    # mul_polys sanity: (1+x)(1-x) = 1 - x^2
    prod = h.mul_polys([1, 1], [1, f.neg(1)])
    assert prod == [1, 0, f.neg(1)]


def test_prng_deterministic():
    f = create_prime_field(P128)
    a = f.prng(b"seed", 10)
    b = f.prng(b"seed", 10)
    assert a == b
    assert f.prng(b"seed") == a[0]
    assert all(0 <= v < P128 for v in a)
    assert f.prng(b"other", 10) != a
