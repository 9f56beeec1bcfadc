"""Checkpoint trace upload + on-device segment-scan reconstruction
(protocol/fused.py _scan_trace): the prover ships every K-th trace state
and re-runs the transition K-1 steps per segment on device, vectorized
over segments.  The reconstruction uses the same IR evaluator as the
constraint stage, so the proof bytes must be IDENTICAL to the
full-upload path."""

import pytest

from examples.mimc import make_mimc_stark, run_mimc
from genstark_tpu.field import P128
from genstark_tpu.protocol import Assertion


def _proof_bytes(steps, opts, use_input):
    stark, constants = make_mimc_stark(
        steps, modulus=P128, use_input=use_input,
        constant_count=min(64, steps // 2), options=opts)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]
    proof = stark.prove(assertions, [[3]] if use_input else [],
                        None if use_input else [3])
    data = stark.serialize(proof)
    assert stark.verify(assertions, stark.parse(data))
    return data


def test_trace_scan_proof_bytes_match_full_upload(monkeypatch):
    # Same config as tests/test_mxu_prover.py so the full-upload baseline
    # program is shared across the suite (compile-bound); n_seg=8 -> K=8,
    # so each segment really runs 7 transition steps on device.
    opts = {"extension_factor": 4, "exe_query_count": 8,
            "fri_query_count": 6}
    full = _proof_bytes(64, opts, use_input=False)
    monkeypatch.setenv("GENSTARK_TRACE_SCAN", "1")
    monkeypatch.setenv("GENSTARK_TRACE_SCAN_MIN", "16")
    monkeypatch.setenv("GENSTARK_TRACE_SCAN_SEG", "8")
    scanned = _proof_bytes(64, opts, use_input=False)
    assert scanned == full


def test_trace_scan_with_input_register(monkeypatch):
    """Input-register statics (span/shift streams) must reconstruct
    identically too."""
    opts = {"extension_factor": 4, "exe_query_count": 8,
            "fri_query_count": 6}
    full = _proof_bytes(64, opts, use_input=True)
    monkeypatch.setenv("GENSTARK_TRACE_SCAN", "1")
    monkeypatch.setenv("GENSTARK_TRACE_SCAN_MIN", "16")
    monkeypatch.setenv("GENSTARK_TRACE_SCAN_SEG", "16")
    scanned = _proof_bytes(64, opts, use_input=True)
    assert scanned == full
