"""Distributed 4-step NTT on a virtual 8-device CPU mesh vs the single-device
transform (the multi-chip test strategy from SURVEY.md section 4)."""

import random

import jax
import pytest

from genstark_tpu import ntt
from genstark_tpu.field import P32, P128, create_prime_field
from genstark_tpu.parallel import distributed_intt, distributed_ntt, make_mesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


@pytest.mark.parametrize("p", [P32, P128])
@pytest.mark.parametrize("n", [256, 1024])
def test_distributed_ntt_matches_single(p, n, mesh8):
    rng = random.Random(n)
    f = create_prime_field(p)
    vals = [rng.randrange(p) for _ in range(n)]
    d = f.device.from_ints(vals)
    want = f.device.to_ints(ntt.ntt(f, d))
    got = f.device.to_ints(distributed_ntt(f, d, mesh8))
    assert got == want


def test_distributed_intt_roundtrip(mesh8):
    rng = random.Random(7)
    f = create_prime_field(P128)
    n = 512
    vals = [rng.randrange(P128) for _ in range(n)]
    d = f.device.from_ints(vals)
    fwd = distributed_ntt(f, d, mesh8)
    back = distributed_intt(f, fwd, mesh8)
    assert f.device.to_ints(back) == vals
