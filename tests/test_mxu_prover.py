"""A full fused-prover proof with the MXU multi-level NTT forced on (the
XLA reference dispatch on CPU runs the identical math as the TPU Pallas
kernels) must be BYTE-IDENTICAL to the default-path proof: the MXU path is
plug-compatible at every transform site (commit iNTT/LDE with folded n^-1,
composition iNTT/LDE with folded Nc^-1, boundary LDEs)."""

import hashlib

import pytest

from examples.mimc import make_mimc_stark, run_mimc
from genstark_tpu import ntt
from genstark_tpu.field import P128
from genstark_tpu.protocol import Assertion


def _proof_bytes(steps, opts):
    stark, constants = make_mimc_stark(
        steps, modulus=P128, use_input=False,
        constant_count=min(64, steps // 2), options=opts)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]
    proof = stark.prove(assertions, [], [3])
    data = stark.serialize(proof)
    assert stark.verify(assertions, stark.parse(data))
    return data


def test_mxu_proof_bytes_match_default(monkeypatch):
    # Smallest config with a pinned default-path digest (the suite is
    # XLA:CPU-compile-bound and the MXU reference path compiles 289 digit
    # dots per level — Ne = 256 keeps the program small).  Covers the
    # bundle wiring through commit/composition/boundary transforms and the
    # folded Nc^-1 scale; the folded T^-1 (iNTT) scale is pinned by
    # tests/test_mxu_ntt.py's inverse round-trip.
    opts = {"extension_factor": 4, "exe_query_count": 8,
            "fri_query_count": 6}
    monkeypatch.setenv("GENSTARK_MXU", "1")
    monkeypatch.setenv("GENSTARK_MXU_MIN", "64")
    ntt._use_mxu.cache_clear()
    ntt._mxu_min_n.cache_clear()
    try:
        data = _proof_bytes(64, opts)
    finally:
        ntt._use_mxu.cache_clear()
        ntt._mxu_min_n.cache_clear()
    assert (len(data), hashlib.sha256(data).hexdigest()) == (
        7329,
        "3fa3bc9f84d3505912258df9974587b18b35619116a2787786b3beacd3cc4917"), \
        "MXU-path proof bytes differ from the default-path pinned digest"
