"""AirAssembly imports into AirScript.

Covers both usage modes the reference exercises:
- `with $r[a..b] yield Hash(args)` component inlining
  (/root/reference/examples/assembly/merkleProof.ts:38-77);
- whole-body component aliasing
  (/root/reference/examples/assembly/merkleUpdate.ts:36-58).

Oracle: lib224 Poseidon over scalar Merkle trees (poseidon_utils.MerkleTree2).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.assembly_lib import poseidon_oracle
from examples.merkle_import import (ASSEMBLY_DIR, MERKLE_PROOF_SRC,
                                    MERKLE_UPDATE_SRC)
from examples.poseidon_utils import MerkleTree2, to_binary_array
from genstark_tpu.air.ir import InputRegister, eval_host
from genstark_tpu.air.module import AirModule
from genstark_tpu.air.script import AirScriptError, compile_script


def host_trace(schema, inputs, ext=32):
    mod = AirModule(schema, extension_factor=ext)
    ctx = mod.init_proving_context(inputs)
    cols = ctx.static_columns
    f = schema.field.host
    env = {"field": f, "trace": [0] * schema.trace_width,
           "static": [c[0] for c in cols], "seed": []}
    state = [eval_host(e, env, {}) for e in schema.init]
    rows = [state]
    for t in range(ctx.trace_length - 1):
        env = {"field": f, "trace": state, "static": [c[t] for c in cols]}
        state = [eval_host(e, env, {}) for e in schema.transition]
        rows.append(state)
    return rows


@pytest.fixture(scope="module")
def oracle224():
    return poseidon_oracle("224")


def test_with_import_trace_reaches_root(oracle224):
    field, oracle = oracle224
    schema = compile_script(MERKLE_PROOF_SRC, base_path=ASSEMBLY_DIR)
    assert schema.trace_width == 6
    depth, index = 4, 5
    tree = MerkleTree2(field.prng(b"\x2a", 2 ** depth), oracle)
    branch = tree.prove(index)
    bits = [0] + to_binary_array(index, depth)[:-1]
    rows = host_trace(schema, [[branch[0]], [branch[1:]], [bits]])
    assert rows[-1][0] == tree.root


def test_whole_body_alias_update(oracle224):
    field, oracle = oracle224
    schema = compile_script(MERKLE_UPDATE_SRC, base_path=ASSEMBLY_DIR)
    assert schema.trace_width == 12 and len(schema.constraints) == 13
    # caller input flags applied to the component's registers
    inputs = [r for r in schema.static_registers if isinstance(r, InputRegister)]
    assert inputs[-1].binary          # indexBits: boolean[1][1]
    depth, index = 4, 5
    leaves1 = field.prng(b"\x51", 2 ** depth)
    leaves1[index] = 9
    tree1 = MerkleTree2(leaves1, oracle)
    leaves2 = list(leaves1)
    leaves2[index] = 11
    tree2 = MerkleTree2(leaves2, oracle)
    bits = [0] + to_binary_array(index, depth)[:-1]
    rows = host_trace(schema, [[tree1.prove(index)[0]], [tree2.prove(index)[0]],
                               [tree1.prove(index)[1:]], [bits]])
    assert rows[-1][0] == tree1.root
    assert rows[-1][6] == tree2.root


def test_binary_input_enforced_by_alias(oracle224):
    """The aliased component carries the bit-ness constraint
    (lib224.aa ComputeMerkleUpdate evaluation) and the binary input flag
    rejects non-bit values at proving time."""
    field, oracle = oracle224
    from genstark_tpu import instantiate
    schema = compile_script(MERKLE_UPDATE_SRC, base_path=ASSEMBLY_DIR)
    stark = instantiate(schema, options={"extension_factor": 32,
                                         "exe_query_count": 2,
                                         "fri_query_count": 2})
    from genstark_tpu.protocol import Assertion
    with pytest.raises(ValueError):
        stark.prove([Assertion(0, 0, 0)],
                    [[1], [2], [[3, 4, 5, 6]], [[0, 2, 0, 0]]])


def test_unknown_import_path_rejected():
    src = MERKLE_PROOF_SRC.replace("lib224.aa", "nonexistent.aa")
    with pytest.raises(AirScriptError):
        compile_script(src, base_path=ASSEMBLY_DIR)


def test_with_body_register_coverage_validated():
    src = MERKLE_PROOF_SRC.replace("with $r[3..5] yield Hash(node, h);", "")
    with pytest.raises(AirScriptError):
        compile_script(src, base_path=ASSEMBLY_DIR)


@pytest.mark.slow
def test_merkle_proof_import_prove_verify_device():
    from examples.merkle_import import run_merkle_proof
    stark, proof, assertions, public = run_merkle_proof(tree_depth=4, index=5)
    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    assert stark.verify(assertions, stark.parse(buf), public_inputs=public)
