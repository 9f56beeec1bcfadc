"""The factored table pack (outer*inner device regeneration of long power
tables, protocol/fused.py) must be transparent: proof bytes are identical to
the direct-upload pack.  At production scale (Ne = 2^24) the direct pack is
~2 GB — the factored path is what makes 2^20-step proofs feasible — but the
math is checkable at toy scale by forcing the threshold down."""

from examples.mimc import make_mimc_stark, run_mimc
from genstark_tpu.field import P32
from genstark_tpu.protocol import Assertion
from genstark_tpu.protocol.fused import FusedProver

# matches tests/test_split_stages.py so the direct-pack baseline program is
# shared across files (compile-bound suite; see test_sharded_prover.py note)
_OPTS = {"extension_factor": 4, "exe_query_count": 10, "fri_query_count": 6}


def _proof_bytes(steps=128):
    stark, constants = make_mimc_stark(steps, modulus=P32, use_input=False,
                                       constant_count=16, options=_OPTS)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]
    proof = stark.prove(assertions, [], [3])
    assert stark.verify(assertions, proof)
    return stark.serialize(proof)


def test_factored_pack_bytes_identical(monkeypatch):
    direct = _proof_bytes()
    # force every table through the factored path (threshold below any len)
    monkeypatch.setattr(FusedProver, "_factor_threshold", 8)
    factored = _proof_bytes()
    assert factored == direct
