"""True control-value parity for the AirAssembly stdlib semantics.

The reference validates its lib128.aa components against an independent
Poseidon implementation (/root/reference/examples/assembly/lib128.ts:51-77:
`createHash(...)([42,43,44,45])` must equal the trace's final state; the
Merkle-root trace must end at the root of an independently built tree).
These tests replicate that oracle in Python — they pin the input-shift and
mask-alignment semantics of the AIR engine, which self-consistency tests
(host-vs-device of the same schema) cannot catch.

All host arithmetic: no JAX involved.
"""

import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.poseidon_utils import (MerkleTree, create_hash, get_mds_matrix,
                                     to_binary_array, transpose)
from genstark_tpu.air.assembly import compile_assembly
from genstark_tpu.air.ir import eval_host
from genstark_tpu.field import P128, create_prime_field

from genstark_tpu.stdlib import lib128_source
LIB128 = lib128_source()
F_ROUNDS, P_ROUNDS, WIDTH, SBOX = 8, 55, 6, 5
STEPS = F_ROUNDS + P_ROUNDS + 1    # 64


@pytest.fixture(scope="module")
def field():
    return create_prime_field(P128)


@pytest.fixture(scope="module")
def round_constants(field):
    """ark rows = transpose of the six prng(sha256, 'Hades<j>') cycles
    (lib128.ts:21-28)."""
    cols = [field.prng(f"Hades{j}".encode(), 64) for j in range(1, 7)]
    return transpose(cols)


@pytest.fixture(scope="module")
def poseidon(field, round_constants):
    return create_hash(field.host, SBOX, F_ROUNDS, P_ROUNDS, WIDTH,
                       round_constants)


def host_trace(schema, inputs, seed=None):
    """Pure-host simulation of the AIR (init at step 0, transition after)."""
    from genstark_tpu import instantiate
    stark = instantiate(schema, options={"extension_factor": 16,
                                         "exe_query_count": 2,
                                         "fri_query_count": 2})
    ctx = stark.air.init_proving_context(inputs, seed)
    cols = ctx.static_columns
    f = stark.air.field.host
    T = ctx.trace_length

    def statics_at(t):
        return [cols[k][t] for k in range(len(cols))]

    env = {"field": f, "trace": [0] * schema.trace_width,
           "static": statics_at(0), "seed": ctx.seed}
    state = [eval_host(e, env, {}) for e in schema.init]
    rows = [state]
    for t in range(T - 1):
        env = {"field": f, "trace": state, "static": statics_at(t)}
        state = [eval_host(e, env, {}) for e in schema.transition]
        rows.append(state)
    return rows


def test_mds_matrix_matches_lib128_literal(field):
    """lib128.aa's inline MDS (lines 5-12) is getMdsMatrix(field, 6)
    (poseidon/utils.ts:64-79) — validates our Cauchy-MDS derivation."""
    lines = LIB128.splitlines()
    start = next(i for i, l in enumerate(lines) if "(const $mds matrix" in l)
    literal = [[int(v) for v in re.findall(r"\d+", lines[start + 1 + r])]
               for r in range(WIDTH)]
    assert get_mds_matrix(field.host, WIDTH) == literal


def test_poseidon_hash_trace_matches_oracle(poseidon):
    """ComputePoseidonHash([42,43,44,45]) final state == createHash oracle
    (lib128.ts:51-77 testHash)."""
    schema = compile_assembly(LIB128, "ComputePoseidonHash")
    rows = host_trace(schema, [[42], [43], [44], [45]])
    assert len(rows) == STEPS
    control = poseidon([42, 43, 44, 45])
    assert rows[STEPS - 1][0] == control[0]
    assert rows[STEPS - 1][1] == control[1]


def test_merkle_root_trace_matches_oracle(field, poseidon):
    """ComputeMerkleRoot over a depth-4 tree ends at the independently
    computed root (lib128.ts testMerkleProof / merkleProof.ts:109-134)."""
    depth = 4
    leaves = [[field.prng(b"\x2a", 2 ** depth)[i],
               field.prng(b"\x2b", 2 ** depth)[i]] for i in range(2 ** depth)]
    tree = MerkleTree(leaves, poseidon)
    index = 5
    proof = tree.prove(index)
    assert MerkleTree.verify(tree.root, index, proof, poseidon)

    index_bits = to_binary_array(index, depth)
    index_bits = [0] + index_bits[:-1]        # shift by one (lib128.ts pattern)
    leaf = proof[0]
    nodes = transpose(proof[1:])
    inputs = [[leaf[0]], [leaf[1]], [nodes[0]], [nodes[1]], [index_bits]]

    schema = compile_assembly(LIB128, "ComputeMerkleRoot")
    rows = host_trace(schema, inputs)
    assert len(rows) == depth * STEPS
    assert rows[-1][0] == tree.root[0]
    assert rows[-1][1] == tree.root[1]


def test_merkle_update_trace_matches_oracle(field, poseidon):
    """ComputeMerkleUpdate: registers 0/6 end at the pre-/post-update roots
    (/root/reference/examples/assembly/merkleUpdate.ts:60-92)."""
    depth = 4
    base = [[field.prng(b"\x51", 2 ** depth)[i],
             field.prng(b"\x52", 2 ** depth)[i]] for i in range(2 ** depth)]
    index, old_value, new_value = 6, 9, 11
    # scalar-leaf variant (merkleUpdate.ts uses MerkleTree2-style scalars via
    # element[1] inputs; lib128 ComputeMerkleUpdate uses 2-element leaves)
    leaves1 = [list(v) for v in base]
    leaves1[index] = [old_value, old_value]
    tree1 = MerkleTree(leaves1, poseidon)
    proof1 = tree1.prove(index)
    leaves2 = [list(v) for v in leaves1]
    leaves2[index] = [new_value, new_value]
    tree2 = MerkleTree(leaves2, poseidon)
    proof2 = tree2.prove(index)

    index_bits = to_binary_array(index, depth)
    index_bits = [0] + index_bits[:-1]
    old_leaf, new_leaf = proof1[0], proof2[0]
    nodes = transpose(proof1[1:])
    inputs = [[old_leaf[0]], [old_leaf[1]], [new_leaf[0]], [new_leaf[1]],
              [nodes[0]], [nodes[1]], [index_bits]]

    schema = compile_assembly(LIB128, "ComputeMerkleUpdate")
    rows = host_trace(schema, inputs)
    assert rows[-1][0] == tree1.root[0]
    assert rows[-1][1] == tree1.root[1]
    assert rows[-1][12] == tree2.root[0]
    assert rows[-1][13] == tree2.root[1]
