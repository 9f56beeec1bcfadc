"""The single-chip 4-step NTT decomposition (ntt._four_step_core — the
TPU-path form of large transforms) must agree exactly with the per-stage
transform and with a host-side polynomial-evaluation oracle."""

import numpy as np
import pytest

from genstark_tpu import ntt
from genstark_tpu.field import P32, P128, create_prime_field


@pytest.mark.parametrize("modulus,n", [(P32, 1 << 13), (P128, 1 << 13)])
def test_four_step_matches_direct(modulus, n):
    field = create_prime_field(modulus)
    rng = np.random.default_rng(7)
    vals = [int(v) % field.modulus for v in rng.integers(0, 1 << 63, size=n)]
    x = field.device.from_ints(vals)
    plan = ntt.get_plan(field, n, False)
    direct = field.device.to_ints(ntt.ntt_core_table(field, x, n, plan.w_table))
    four = field.device.to_ints(ntt._four_step_core(field, x, n, plan.w_table))
    assert four == direct


def test_four_step_panel_parameter(n=1 << 12):
    """A precomputed twiddle panel (the fused prover's pack parameter) must
    give the same transform as the in-program gather build."""
    import jax.numpy as jnp
    from genstark_tpu.field.limbs import power_series_mont_np
    field = create_prime_field(P128)
    rng = np.random.default_rng(3)
    vals = [int(v) % field.modulus for v in rng.integers(0, 1 << 63, size=n)]
    x = field.device.from_ints(vals)
    plan = ntt.get_plan(field, n, False)
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    series = power_series_mont_np(field.params, plan.w, n)
    idx = (np.arange(n1)[:, None] * np.arange(n2)[None, :]).reshape(-1)
    panel = jnp.asarray(np.ascontiguousarray(series[:, idx]))
    with_panel = ntt._four_step_core(field, x, n, plan.w_table, panel=panel)
    without = ntt._four_step_core(field, x, n, plan.w_table)
    assert field.device.to_ints(with_panel) == field.device.to_ints(without)


def test_four_step_batched(batch=3, n=1 << 12):
    field = create_prime_field(P32)
    rng = np.random.default_rng(11)
    import jax.numpy as jnp
    xs = [field.device.from_ints(
        [int(v) % field.modulus for v in rng.integers(0, 1 << 31, size=n)])
        for _ in range(batch)]
    stacked = jnp.stack(xs)
    plan = ntt.get_plan(field, n, False)
    four = ntt._four_step_core(field, stacked, n, plan.w_table)
    for b in range(batch):
        direct = field.device.to_ints(
            ntt.ntt_core_table(field, xs[b], n, plan.w_table))
        assert field.device.to_ints(four[b]) == direct
