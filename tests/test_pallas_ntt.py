"""Pallas butterfly-stage kernel vs the pure-jnp stage (interpret mode on
CPU; the real Mosaic path runs on TPU via bench.py).  Covers both in-kernel
strategies: lane rolls (m < _SMALL_M) and aligned reshape (m >= _SMALL_M)."""

import jax.numpy as jnp
import numpy as np
import pytest

from genstark_tpu.field import P32, P128, create_prime_field
from genstark_tpu.ntt import get_plan
from genstark_tpu.ntt.pallas_kernels import _SMALL_M, butterfly_stage


@pytest.mark.parametrize("modulus", [P32, P128])
@pytest.mark.parametrize("m", [1, 4, 64, 256])
def test_butterfly_stage_matches_jnp(modulus, m):
    field = create_prime_field(modulus)
    dev = field.device
    n, B = 1024, 2
    rng = np.random.RandomState(3)
    vals = [rng.randint(0, min(modulus, 2 ** 60)) for _ in range(B * n)]
    x = dev.from_ints(vals).reshape(dev.L, B, n)

    plan = get_plan(field, n, False)
    L = dev.L
    half, stride, g = n // 2, (n // 2) // m, n // (2 * m)
    tw = plan.w_table.reshape(L, m, stride)[:, :, 0]
    twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)

    # jnp reference stage
    y = x.reshape(L, B, g, 2, m)
    lo = y[:, :, :, 0, :].reshape(L, B, half)
    hi = y[:, :, :, 1, :].reshape(L, B, half)
    t = dev.mont_mul(hi, twf[:, None, :])
    ref = jnp.stack([dev._add(lo, t).reshape(L, B, g, m),
                     dev._sub(lo, t).reshape(L, B, g, m)],
                    axis=-2).reshape(L, B, n)

    tw_in = twf if m >= _SMALL_M else \
        jnp.broadcast_to(tw[:, None, None, :], (L, g, 2, m)).reshape(L, n)
    got = butterfly_stage(field, x, tw_in, n, m, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("modulus", [P128])
def test_split_stage_matches_jnp(modulus):
    """Large-m split kernel (lo/hi fetched as separate block-aligned views)."""
    from genstark_tpu.ntt.pallas_kernels import _stage_fn_split
    field = create_prime_field(modulus)
    dev = field.device
    n, B, m, blk = 1024, 2, 256, 64
    rng = np.random.RandomState(5)
    vals = [rng.randint(0, 2 ** 60) for _ in range(B * n)]
    x = dev.from_ints(vals).reshape(dev.L, B, n)
    plan = get_plan(field, n, False)
    L = dev.L
    half, stride, g = n // 2, (n // 2) // m, n // (2 * m)
    tw = plan.w_table.reshape(L, m, stride)[:, :, 0]
    twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)

    y = x.reshape(L, B, g, 2, m)
    lo = y[:, :, :, 0, :].reshape(L, B, half)
    hi = y[:, :, :, 1, :].reshape(L, B, half)
    t = dev.mont_mul(hi, twf[:, None, :])
    ref = jnp.stack([dev._add(lo, t).reshape(L, B, g, m),
                     dev._sub(lo, t).reshape(L, B, g, m)],
                    axis=-2).reshape(L, B, n)

    fn = _stage_fn_split(L, dev._p_np.tobytes(), int(dev._n0p), n, B, m, blk,
                         True)
    x2 = jnp.swapaxes(x, 0, 1).reshape(B * L, n)
    got = jnp.swapaxes(fn(x2, twf).reshape(B, L, n), 0, 1)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
