"""The three-stage prover (large-domain memory mode, protocol/fused.py)
must produce byte-identical proofs to the single-program mode.  Forced on
at toy scale via GENSTARK_SPLIT_NE."""

from examples.mimc import make_mimc_stark, run_mimc
from genstark_tpu.field import P32
from genstark_tpu.protocol import Assertion

_OPTS = {"extension_factor": 4, "exe_query_count": 10, "fri_query_count": 6}


def _proof(steps=128):
    stark, constants = make_mimc_stark(steps, modulus=P32, use_input=False,
                                       constant_count=16, options=_OPTS)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]
    proof = stark.prove(assertions, [], [3])
    assert stark.verify(assertions, proof)
    return stark.serialize(proof)


def test_split_stage_proof_bytes_identical(monkeypatch):
    single = _proof()
    monkeypatch.setenv("GENSTARK_SPLIT_NE", "1")   # force split mode
    split = _proof()
    assert split == single
    # chunked pointwise mode (large-domain memory lever): force both the
    # chunking AND the factored tables it draws domain/incr chunks from
    from genstark_tpu.protocol.fused import FusedProver
    monkeypatch.setenv("GENSTARK_CHUNK_ELEMS", "64")
    monkeypatch.setattr(FusedProver, "_factor_threshold", 8)
    chunked = _proof()
    assert chunked == single
