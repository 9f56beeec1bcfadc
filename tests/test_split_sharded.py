"""Split (three-stage) mode composed WITH mesh sharding: the flagship
multi-chip configuration is a 2^20-step trace (Ne = 2^24) sharded over a few
chips, which needs BOTH the stage boundaries (peak-memory staging) and the
domain sharding.  Forced on at toy scale via GENSTARK_SPLIT_NE /
GENSTARK_CHUNK_ELEMS: proof bytes must equal the single-device
single-program proof (same math, same transcript).
"""

import jax
import pytest

from examples.mimc import make_mimc_stark, run_mimc
from genstark_tpu.field import P32
from genstark_tpu.parallel import make_mesh
from genstark_tpu.protocol import Assertion

_OPTS = {"extension_factor": 4, "exe_query_count": 10, "fri_query_count": 6}


def _proof(steps=128, mesh=None):
    stark, constants = make_mimc_stark(steps, modulus=P32, use_input=False,
                                       constant_count=16, options=_OPTS)
    if mesh is not None:
        stark.set_mesh(mesh)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]
    proof = stark.prove(assertions, [], [3])
    assert stark.verify(assertions, proof)
    return stark.serialize(proof)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_split_sharded_proof_bytes_identical(monkeypatch):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = _proof()                                  # fused, one device
    monkeypatch.setenv("GENSTARK_SPLIT_NE", "1")       # force three stages
    split_sharded = _proof(mesh=make_mesh(8))
    assert split_sharded == single


def test_split_sharded_chunked_proof_bytes_identical(monkeypatch):
    """Chunked pointwise passes (cmap1 / _lcomb_chunked) under a mesh:
    sequential domain chunks, each spread over the devices."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from genstark_tpu.protocol.fused import FusedProver
    single = _proof()
    monkeypatch.setenv("GENSTARK_SPLIT_NE", "1")
    monkeypatch.setenv("GENSTARK_CHUNK_ELEMS", "64")   # Ne=512 -> 8 chunks
    monkeypatch.setattr(FusedProver, "_factor_threshold", 8)
    chunked = _proof(mesh=make_mesh(8))
    assert chunked == single
