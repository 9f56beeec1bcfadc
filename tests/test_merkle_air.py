"""End-to-end Merkle-proof STARK from the reference's AirAssembly stdlib
(lib128.aa ComputeMerkleRoot): nested rank-2 inputs (childof/peerof), masks,
shift -1, public inputs — proved and verified.

Oracle: independent host-int simulation of the transition relation through
`eval_host` over the expanded static columns (validates device trace
generation + the whole protocol stack against host arithmetic).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genstark_tpu import instantiate
from genstark_tpu.air.assembly import compile_assembly
from genstark_tpu.air.ir import eval_host
from genstark_tpu.protocol import Assertion

DEPTH = 4


@pytest.fixture(scope="module")
def merkle_stark():
    from genstark_tpu.stdlib import lib128_source
    src = lib128_source()
    schema = compile_assembly(src, "ComputeMerkleRoot")
    stark = instantiate(schema, options={
        "hash_algorithm": "blake2s256", "extension_factor": 16,
        "exe_query_count": 24, "fri_query_count": 12})
    return stark


def host_trace(stark, inputs, seed=None):
    """Simulate the execution trace on host ints via the IR interpreter."""
    context = stark.air.init_proving_context(inputs, seed)
    schema = stark.air.schema
    cols = context.static_columns
    T = context.trace_length
    f = stark.air.field.host

    def statics_at(t):
        return [cols[k][t] for k in range(len(cols))]

    env = {"field": f, "trace": [0] * schema.trace_width,
           "static": statics_at(0), "seed": context.seed}
    state = [eval_host(e, env, {}) for e in schema.init]
    rows = [state]
    for t in range(T - 1):
        env = {"field": f, "trace": state, "static": statics_at(t)}
        state = [eval_host(e, env, {}) for e in schema.transition]
        rows.append(state)
    return rows, context


@pytest.mark.slow
def test_merkle_root_prove_verify(merkle_stark):
    stark = merkle_stark
    p = stark.air.field.modulus
    leaf1, leaf2 = 123456789, 987654321
    nodes1 = [11 + i for i in range(DEPTH)]
    nodes2 = [1000003 + i for i in range(DEPTH)]
    index_bits = [1, 0, 1, 1]

    inputs = [[leaf1], [leaf2], [nodes1], [nodes2], [index_bits]]
    rows, context = host_trace(stark, inputs)
    assert context.trace_length == DEPTH * 64
    assert context.input_shapes == [[1], [1], [1, DEPTH], [1, DEPTH], [1, DEPTH]]

    root = rows[-1][0]
    assertions = [Assertion(step=DEPTH * 64 - 1, register=0, value=root)]
    proof = stark.prove(assertions, inputs)
    assert proof.i_shapes == context.input_shapes

    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    parsed = stark.parse(buf)
    assert stark.verify(assertions, parsed, public_inputs=[[index_bits]])


@pytest.mark.slow
def test_merkle_root_wrong_public_input_rejected(merkle_stark):
    stark = merkle_stark
    leaf1, leaf2 = 5, 7
    nodes1 = [21, 22, 23, 24]
    nodes2 = [31, 32, 33, 34]
    index_bits = [0, 1, 0, 0]
    inputs = [[leaf1], [leaf2], [nodes1], [nodes2], [index_bits]]
    rows, _ = host_trace(stark, inputs)
    assertions = [Assertion(step=DEPTH * 64 - 1, register=0, value=rows[-1][0])]
    proof = stark.prove(assertions, inputs)
    wrong_bits = [1, 1, 0, 0]
    with pytest.raises(Exception):
        stark.verify(assertions, proof, public_inputs=[[wrong_bits]])


def test_binary_input_validation(merkle_stark):
    # index bits register is declared binary in AirScript terms? lib128 uses
    # plain public input; feed a non-bit value through the binary path of a
    # schema that declares it — covered via direct constraint: the update
    # export enforces bit-ness in-constraint, so here just check layout errors
    stark = merkle_stark
    with pytest.raises(ValueError):
        stark.prove([Assertion(0, 0, 0)],
                    [[1], [2], [[1, 2]], [[1, 2, 3]], [[0, 1]]])
