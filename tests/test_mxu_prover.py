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
    # Same config as tests/test_sharded_prover.py's pinned p128 fold test,
    # so the DEFAULT-path baseline is the already-pinned digest (no second
    # prover program compile in the suite).
    opts = {"extension_factor": 4, "exe_query_count": 10,
            "fri_query_count": 6}
    monkeypatch.setenv("GENSTARK_MXU", "1")
    monkeypatch.setenv("GENSTARK_MXU_MIN", "64")
    ntt._use_mxu.cache_clear()
    ntt._mxu_min_n.cache_clear()
    try:
        data = _proof_bytes(128, opts)
    finally:
        ntt._use_mxu.cache_clear()
        ntt._mxu_min_n.cache_clear()
    assert (len(data), hashlib.sha256(data).hexdigest()) == (
        8119,
        "ea2c42e4b7fe34724f94d38b8c9452528df43f9946096fd6eda61bbf13740d9f"), \
        "MXU-path proof bytes differ from the default-path pinned digest"
