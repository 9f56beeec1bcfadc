"""The Pallas elementwise Montgomery tile kernels (field/pallas_ops.py) run
the identical limb math as DeviceField's jnp formulation — pinned here in
interpret mode (kernel body + block plumbing, no TPU needed), including the
[L, 1]-broadcast scalar path and the factored outer-product table kernel."""

import numpy as np
import pytest

import jax.numpy as jnp

from genstark_tpu.field import P128, create_prime_field
from genstark_tpu.field import pallas_ops


@pytest.fixture(scope="module")
def dev():
    return create_prime_field(P128).device


def _rand_ints(n, seed):
    p = P128
    rng = np.random.default_rng(seed)
    return [int(a) * int(b) % p
            for a, b in zip(rng.integers(0, 1 << 63, size=n),
                            rng.integers(1, 1 << 63, size=n))]


@pytest.mark.parametrize("op", ["mul", "add", "sub"])
def test_elementwise_matches_jnp(dev, op):
    n = 4096
    a = dev.from_ints(_rand_ints(n, 1))
    b = dev.from_ints(_rand_ints(n, 2))
    c = dev.from_ints([987654321987654321])          # [L, 1] scalar
    ref = {"mul": dev.mont_mul, "add": dev._add, "sub": dev._sub}[op]
    got = pallas_ops.elementwise(dev, op, a, b, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref(a, b)))
    got_s = pallas_ops.elementwise(dev, op, a, c, interpret=True)
    assert np.array_equal(np.asarray(got_s), np.asarray(ref(a, c)))


def test_elementwise_extremes(dev):
    """p-1 everywhere: maximal limbs through every carry/borrow chain."""
    n = 2048
    a = dev.from_ints([P128 - 1] * n)
    for op, ref in (("mul", dev.mont_mul), ("add", dev._add),
                    ("sub", dev._sub)):
        got = pallas_ops.elementwise(dev, op, a, a, interpret=True)
        assert np.array_equal(np.asarray(got), np.asarray(ref(a, a))), op


def test_outer_product_table(dev):
    p = P128
    nj, s = 8, 2048
    outer = dev.from_ints([pow(5, s * j, p) for j in range(nj)])
    inner = dev.from_ints([pow(5, k, p) for k in range(s)])
    got = pallas_ops.outer_product_table(dev, outer, inner, interpret=True)
    want = dev.mont_mul(outer[:, :, None], inner[:, None, :]).reshape(8, -1)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_outer_product_table_rejects_small_s(dev):
    outer = dev.from_ints([1] * 8)
    inner = dev.from_ints([1] * 64)
    assert pallas_ops.outer_product_table(dev, outer, inner,
                                          interpret=True) is None
