"""The MXU digit-matmul DFT (ntt/mxu.py) must agree with a host big-int DFT
oracle, with the production VPU transform, and across its three
implementations (XLA reference, Pallas interpret, multi-level core).

The balanced signed base-256 scheme replaces galois's WASM transform kernels
(consumed at /root/reference/lib/Stark.ts:106-109) on the MXU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genstark_tpu import ntt
from genstark_tpu.field import P128, create_prime_field
from genstark_tpu.field.limbs import ints_to_limbs, limbs_to_ints
from genstark_tpu.ntt import mxu


@pytest.fixture(scope="module")
def field():
    return create_prime_field(P128)


def _dft_oracle(field, values, root):
    p = field.modulus
    n = len(values)
    return [sum(pow(root, r * c, p) * values[c] for c in range(n)) % p
            for r in range(n)]


@pytest.mark.parametrize("m,B", [(16, 3), (64, 2), (128, 2)])
def test_mxu_dft_ref_matches_oracle(field, m, B):
    f = field.host
    root = f.get_root_of_unity(m)
    w8 = jnp.asarray(mxu.w_digits(field, m, root))
    rng = np.random.default_rng(13)
    p = field.modulus
    cols = [[int(a) * int(b) % p
             for a, b in zip(rng.integers(0, 1 << 62, size=m),
                             rng.integers(1, 1 << 62, size=m))]
            for _ in range(B)]
    y = np.zeros((B, 8, m), dtype=np.uint32)
    for b in range(B):
        y[b] = ints_to_limbs(cols[b], 8)
    out = mxu.mxu_dft_ref(field, jnp.asarray(y), m, w8)
    for b in range(B):
        got = limbs_to_ints(np.asarray(out[b]))
        assert got == _dft_oracle(field, cols[b], root), f"column {b}"


def test_mxu_dft_extreme_values(field):
    """All-(p-1) input: maximal digits through the s32 accumulators and the
    solinas reduction chain."""
    m = 128
    f = field.host
    p = field.modulus
    root = f.get_root_of_unity(m)
    w8 = jnp.asarray(mxu.w_digits(field, m, root))
    y = np.asarray(ints_to_limbs([p - 1] * m, 8))[None]
    out = mxu.mxu_dft_ref(field, jnp.asarray(y), m, w8)
    assert limbs_to_ints(np.asarray(out[0])) == \
        _dft_oracle(field, [p - 1] * m, root)


def test_mxu_pallas_interpret_matches_ref(field):
    """The Pallas kernel (interpret mode) runs the identical math as the XLA
    reference — covers the kernel body + block plumbing without a TPU."""
    m, B = 128, 128
    f = field.host
    p = field.modulus
    root = f.get_root_of_unity(m)
    w8 = jnp.asarray(mxu.w_digits(field, m, root))
    rng = np.random.default_rng(29)
    vals = [[int(v) % p for v in rng.integers(0, 1 << 63, size=m)]
            for _ in range(B)]
    y = np.zeros((B, 8, m), dtype=np.uint32)
    for b in range(B):
        y[b] = ints_to_limbs(vals[b], 8)
    ref = mxu.mxu_dft_ref(field, jnp.asarray(y), m, w8)
    got = mxu.mxu_dft(field, jnp.asarray(y), m, w8, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_mxu_factored_twiddle_kernel(field):
    """The Pallas kernel's FACTORED twiddle mode (rest > tile: A-select on a
    block-1 leading dim, B tiled along columns) matches the XLA reference —
    interpret mode, small shapes.  The direct-panel mode is covered by the
    multi-level test below; production sizes hit this path at rest > 128."""
    m, rest, cols = 128, 256, 512
    f = field.host
    p = field.modulus
    n_l = m * rest
    w_l = f.get_root_of_unity(n_l)
    root_m = pow(w_l, rest, p)
    s = mxu.twiddle_split(rest, mxu.level_tc(m))
    assert s >= 128, "must exercise the factored mode"
    w8 = jnp.asarray(mxu.w_digits(field, m, root_m))
    A = jnp.asarray(np.transpose(
        ntt._panel_grid_np(field.params, pow(w_l, s, p), m, rest // s),
        (2, 0, 1)))
    Bt = jnp.asarray(ntt._panel_grid_np(field.params, w_l, m, s))
    tw = {"a": A, "b": Bt}
    rng = np.random.default_rng(41)
    vals = [int(v) % p for v in rng.integers(0, 1 << 63, size=m * cols)]
    x8 = mxu.encode_digits(
        jnp.asarray(ints_to_limbs(vals, 8)).reshape(8, m, cols))
    ref = mxu._run_dft_level_ref(field, w8, x8, m, rest, tw)
    got = mxu.run_dft_level(field, w8, x8, m, rest, tw, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_mxu_multilevel_matches_production(field, monkeypatch):
    """The full multi-level transform (forced on via GENSTARK_MXU=1, XLA ref
    dispatch on CPU) is bit-identical to ntt_core_table, including the
    folded iNTT scale, for a size with a small trailing level."""
    n = 1 << 13                                        # levels [128, 64]
    monkeypatch.setenv("GENSTARK_MXU", "1")
    ntt._use_mxu.cache_clear()
    try:
        rng = np.random.default_rng(5)
        p = field.modulus
        vals = [int(v) % p for v in rng.integers(0, 1 << 63, size=n)]
        x = field.device.from_ints(vals)
        plan = ntt.get_plan(field, n, False)
        assert plan.mxu is not None or ntt.mxu_applicable(field, n)
        tabs = ntt.get_mxu_plan(field, n, plan.w, 1).bundle()
        got = field.device.to_ints(jax.jit(
            lambda a, t: ntt.mxu_transform_core(field, a, n, t))(x, tabs))
        want = field.device.to_ints(jax.jit(
            lambda a, w: ntt.ntt_core_table(field, a, n, w))(x, plan.w_table))
        assert got == want
        # inverse with folded n^-1 scale: roundtrip must be exact
        f = field.host
        inv_root = f.inv(plan.w)
        itabs = ntt.get_mxu_plan(field, n, inv_root,
                                 f.inv(n % p)).bundle()
        back = jax.jit(
            lambda a, t: ntt.mxu_transform_core(field, a, n, t))(
                jnp.asarray(np.asarray(ints_to_limbs(want, 8))), itabs)
        # the transform is representation-agnostic: standard-form input in,
        # standard-form interpolation out (no Montgomery conversion)
        assert limbs_to_ints(np.asarray(back)) == vals
    finally:
        ntt._use_mxu.cache_clear()


# ------------------------------------------------------------- p32 variant
@pytest.fixture(scope="module")
def field32():
    from genstark_tpu.field import P32
    return create_prime_field(P32)


def test_solinas_spec():
    from genstark_tpu.field import P32
    assert mxu.solinas_spec(P128) == (8, 17, 33, 9, 2)
    assert mxu.solinas_spec(P32) == (2, 5, 9, 1536, 1)


@pytest.mark.parametrize("m,B", [(16, 3), (128, 2)])
def test_mxu_dft_ref_p32_matches_oracle(field32, m, B):
    f = field32.host
    root = f.get_root_of_unity(m)
    w8 = jnp.asarray(mxu.w_digits(field32, m, root))
    rng = np.random.default_rng(29)
    p = field32.modulus
    cols = [[int(v) % p for v in rng.integers(0, 1 << 62, size=m)]
            for _ in range(B)]
    y = np.zeros((B, 2, m), dtype=np.uint32)
    for b in range(B):
        y[b] = ints_to_limbs(cols[b], 2)
    out = mxu.mxu_dft_ref(field32, jnp.asarray(y), m, w8)
    for b in range(B):
        got = limbs_to_ints(np.asarray(out[b]))
        assert got == _dft_oracle(field32, cols[b], root), f"column {b}"


def test_mxu_dft_p32_extreme_values(field32):
    m = 128
    p = field32.modulus
    root = field32.host.get_root_of_unity(m)
    w8 = jnp.asarray(mxu.w_digits(field32, m, root))
    y = np.asarray(ints_to_limbs([p - 1] * m, 2))[None]
    out = mxu.mxu_dft_ref(field32, jnp.asarray(y), m, w8)
    assert limbs_to_ints(np.asarray(out[0])) == \
        _dft_oracle(field32, [p - 1] * m, root)


def test_mxu_p32_pallas_interpret_matches_ref(field32):
    m = 128
    B = 256
    p = field32.modulus
    root = field32.host.get_root_of_unity(m)
    w8 = jnp.asarray(mxu.w_digits(field32, m, root))
    rng = np.random.default_rng(31)
    vals = [int(v) % p for v in rng.integers(0, 1 << 62, size=m * B)]
    y = np.asarray(ints_to_limbs(vals, 2)).reshape(2, m, B)
    x8 = mxu.encode_digits(jnp.asarray(y))             # [D, m, B]
    ref = mxu._run_dft_level_ref(field32, w8, x8, m, 1, None)
    got = mxu.run_dft_level(field32, w8, x8, m, 1, None, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    # digit-emitting epilogue agrees too
    refd = mxu._run_dft_level_ref(field32, w8, x8, m, 1, None,
                                  out_digits=True)
    gotd = mxu.run_dft_level(field32, w8, x8, m, 1, None, interpret=True,
                             out_digits=True)
    assert np.array_equal(np.asarray(gotd), np.asarray(refd))


def test_mxu_multilevel_p32_matches_production(field32, monkeypatch):
    """Full multi-level p32 transform (forced on, XLA ref dispatch on CPU)
    is bit-identical to ntt_core_table, incl. the folded iNTT scale."""
    n = 1 << 13
    monkeypatch.setenv("GENSTARK_MXU", "1")
    ntt._use_mxu.cache_clear()
    try:
        rng = np.random.default_rng(7)
        p = field32.modulus
        vals = [int(v) % p for v in rng.integers(0, 1 << 62, size=n)]
        x = field32.device.from_ints(vals)
        plan = ntt.get_plan(field32, n, False)
        tabs = ntt.get_mxu_plan(field32, n, plan.w, 1).bundle()
        got = field32.device.to_ints(jax.jit(
            lambda a, t: ntt.mxu_transform_core(field32, a, n, t))(x, tabs))
        want = field32.device.to_ints(jax.jit(
            lambda a, w: ntt.ntt_core_table(field32, a, n, w))(
                x, plan.w_table))
        assert got == want
        f = field32.host
        itabs = ntt.get_mxu_plan(field32, n, f.inv(plan.w),
                                 f.inv(n % p)).bundle()
        back = jax.jit(
            lambda a, t: ntt.mxu_transform_core(field32, a, n, t))(
                jnp.asarray(np.asarray(ints_to_limbs(want, 2))), itabs)
        assert limbs_to_ints(np.asarray(back)) == vals
    finally:
        ntt._use_mxu.cache_clear()
