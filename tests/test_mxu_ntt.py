"""The MXU int8-matmul DFT prototype (ntt/mxu.py) must agree with a host
big-int DFT oracle and with the production transform."""

import numpy as np
import pytest

from genstark_tpu import ntt
from genstark_tpu.field import P128, create_prime_field
from genstark_tpu.field.limbs import ints_to_limbs, limbs_to_ints
from genstark_tpu.ntt import mxu


def _dft_oracle(field, values):
    f = field.host
    n = len(values)
    w = f.get_root_of_unity(n)
    p = field.modulus
    return [sum(pow(w, r * c, p) * values[c] for c in range(n)) % p
            for r in range(n)]


@pytest.mark.parametrize("n,B", [(16, 3), (64, 2)])
def test_mxu_dft_matches_oracle(n, B):
    import jax.numpy as jnp
    field = create_prime_field(P128)
    rng = np.random.default_rng(13)
    cols = [[int(v) % field.modulus
             for v in rng.integers(0, 1 << 63, size=n) * rng.integers(1, 1 << 63, size=n)]
            for _ in range(B)]
    # x_std: [L, n, B]
    x = np.zeros((8, n, B), dtype=np.uint32)
    for b in range(B):
        x[:, :, b] = ints_to_limbs(cols[b], 8)
    out = mxu.mxu_dft(field, jnp.asarray(x), n)
    for b in range(B):
        got = limbs_to_ints(np.asarray(out[:, :, b]))
        assert got == _dft_oracle(field, cols[b]), f"column {b} differs"


def test_mxu_dft_matches_production_ntt(n=128):
    import jax.numpy as jnp
    field = create_prime_field(P128)
    rng = np.random.default_rng(29)
    vals = [int(v) % field.modulus for v in rng.integers(0, 1 << 63, size=n)]
    x = np.zeros((8, n, 1), dtype=np.uint32)
    x[:, :, 0] = ints_to_limbs(vals, 8)
    out = mxu.mxu_dft(field, jnp.asarray(x), n)
    got = limbs_to_ints(np.asarray(out[:, :, 0]))
    want = field.device.to_ints(ntt.ntt(field, field.device.from_ints(vals)))
    assert got == want
