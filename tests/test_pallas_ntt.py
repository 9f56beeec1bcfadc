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


@pytest.mark.parametrize("modulus", [P32, P128])
def test_multistage_plus_split_matches_jnp_path(modulus):
    """Whole stage sequence through the pallas kernels (multistage covering
    m <= blk, split kernels above) in interpret mode vs the jnp stage path:
    both consume bit-reversed input, so comparing post-stage states checks
    the complete butterfly schedule."""
    import genstark_tpu.ntt as ntt_mod
    import genstark_tpu.ntt.pallas_kernels as pk

    field = create_prime_field(modulus)
    dev = field.device
    L = dev.L
    n, B = 512, 2
    rng = np.random.RandomState(11)
    vals = [rng.randint(0, min(modulus, 2 ** 60)) for _ in range(B * n)]
    x = dev.from_ints(vals).reshape(L, B, n)
    x = jnp.take(x, ntt_mod._bitrev_indices(n), axis=-1)
    plan = get_plan(field, n, False)
    half = n // 2

    # reference: the jnp stage loop
    ref = x
    m = 1
    while m < n:
        stride, g = half // m, n // (2 * m)
        tw = plan.w_table.reshape(L, m, stride)[:, :, 0]
        twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)
        y = ref.reshape(L, B, g, 2, m)
        lo = y[:, :, :, 0, :].reshape(L, B, half)
        hi = y[:, :, :, 1, :].reshape(L, B, half)
        t = dev.mont_mul(hi, twf[:, None, :])
        ref = jnp.stack([dev._add(lo, t).reshape(L, B, g, m),
                         dev._sub(lo, t).reshape(L, B, g, m)],
                        axis=-2).reshape(L, B, n)
        m *= 2

    # pallas path with a tiny _MBLK so split kernels engage too
    real_stage, real_split, real_multi, real_mblk = \
        pk._make_stage, pk._make_stage_split, pk._make_multistage, pk._MBLK
    pk._stage_fn.cache_clear()
    pk._stage_fn_split.cache_clear()
    pk._multistage_fn.cache_clear()
    pk._make_stage = lambda *a: real_stage(*a[:-1], True)
    pk._make_stage_split = lambda *a: real_split(*a[:-1], True)
    pk._make_multistage = lambda *a: real_multi(*a[:-1], True)
    pk._MBLK = 64
    try:
        x2 = jnp.swapaxes(x, 0, 1).reshape(B * L, n)
        x2, last_m = pk.multistage(field, x2, plan.w_table, L, n)
        m = last_m * 2
        while m < n:
            stride, g = half // m, n // (2 * m)
            tw = plan.w_table.reshape(L, m, stride)[:, :, 0]
            if m < pk._SMALL_M:     # roll variant wants interleaved twiddles
                twf = jnp.broadcast_to(tw[:, None, None, :],
                                       (L, g, 2, m)).reshape(L, n)
            else:
                twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)
            x2 = pk.butterfly_stage2(field, x2, twf, L, n, m)
            m *= 2
        got = jnp.swapaxes(x2.reshape(B, L, n), 0, 1)
    finally:
        pk._make_stage, pk._make_stage_split, pk._make_multistage, pk._MBLK = \
            real_stage, real_split, real_multi, real_mblk
        pk._stage_fn.cache_clear()
        pk._stage_fn_split.cache_clear()
        pk._multistage_fn.cache_clear()
    assert np.array_equal(np.asarray(got), np.asarray(ref))
