"""The one-fetch proof path vs its host-sampled fallback, and the
jax.export trace-cache round-trip — proof bytes must be identical in every
case (the transcript depends only on the math, never on which dispatch
flow or cache produced it)."""

import os

import pytest

from genstark_tpu.field import P32


def _foo_stark():
    from genstark_tpu import instantiate_script
    src = """
define Foo over prime field (2^32 - 3 * 2^25 + 1) {
    secret input startValue: element[1];
    transition 1 register {
        for each (startValue) {
            init { yield startValue; }
            for steps [1..63] { yield $r0 + 2; }
        }
    }
    enforce 1 constraint {
        for all steps { enforce transition($r) = $n; }
    }
}
"""
    return instantiate_script(src, {"extension_factor": 16,
                                    "exe_query_count": 12,
                                    "fri_query_count": 8})


def _prove_bytes(stark):
    from genstark_tpu.protocol import Assertion
    assertions = [Assertion(0, 0, 1), Assertion(63, 0, 127)]
    proof = stark.prove(assertions, [[1]])
    assert stark.verify(assertions, proof)
    return stark.serialize(proof)


def test_fallback_path_matches_one_dispatch(monkeypatch):
    """GENSTARK_ONE_DISPATCH=0 (the host-sampled two-dispatch flow — also
    the automatic fallback on device-sampler exhaustion) must produce the
    same bytes as the device-sampled one-fetch flow."""
    one = _prove_bytes(_foo_stark())
    monkeypatch.setenv("GENSTARK_ONE_DISPATCH", "0")
    two = _prove_bytes(_foo_stark())
    assert one == two


def test_export_cache_roundtrip(tmp_path, monkeypatch):
    """Proving through a cold export cache, then again through the warm
    cache (deserialized StableHLO) in a fresh prover, yields identical
    bytes; a cache dir entry is written on the cold pass."""
    monkeypatch.setenv("GENSTARK_EXPORT_CACHE_DIR", str(tmp_path))
    cold = _prove_bytes(_foo_stark())
    entries = list(os.listdir(tmp_path))
    # export may legitimately decline (fall back to plain jit) on backends
    # where some primitive is unexportable — bytes must match either way,
    # but when entries exist the warm pass exercises deserialization
    warm = _prove_bytes(_foo_stark())
    assert cold == warm
    if entries:
        assert any(e.startswith("pipeline_packed-") for e in entries)


def test_candidate_exhaustion_triggers_fallback(monkeypatch):
    """A too-small device candidate window (found < count) must trigger the
    automatic host-sampled fallback and still produce the canonical
    bytes."""
    from genstark_tpu.protocol.fused import FusedProver
    want = _prove_bytes(_foo_stark())
    monkeypatch.setattr(FusedProver, "_n_cand", staticmethod(lambda c: 8))
    got = _prove_bytes(_foo_stark())
    assert got == want
