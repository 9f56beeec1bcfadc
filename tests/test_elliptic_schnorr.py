"""EC point-multiplication and Schnorr-signature STARKs (host-level parity).

- pointmul.aa's trace must reach the reference's hard-coded product
  coordinates (/root/reference/examples/elliptic/pointMul.ts:30-33), which an
  independent affine secp224r1 oracle reproduces.
- lib224.aa's Poseidon must match the oracle, its MDS literal must equal the
  derived Cauchy matrix, and VerifySchnorrSignature must end at h
  (lib224.ts:161-208) — s*G + h*P == R for a valid signature.
"""

import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples import assembly_lib, elliptic
from genstark_tpu.stdlib import lib224_source as _lib224
from genstark_tpu.stdlib import pointmul_source
from examples.poseidon_utils import get_mds_matrix
from genstark_tpu.air.assembly import compile_assembly
from genstark_tpu.air.ir import eval_host
from genstark_tpu.air.module import AirModule
from genstark_tpu.field import P224, create_prime_field


def host_trace(schema, inputs, ext=16):
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


def test_ec_oracle_matches_reference_controls():
    assert elliptic.ec_mul((elliptic.G_X, elliptic.G_Y),
                           elliptic.SCALAR) == elliptic.EXPECTED


def test_pointmul_trace_matches_oracle():
    schema = compile_assembly(pointmul_source(), "default")
    inputs = [[elliptic.G_X], [elliptic.G_Y],
              [elliptic.to_bits(elliptic.SCALAR)]]
    rows = host_trace(schema, inputs)
    assert len(rows) == 256
    assert (rows[255][2], rows[255][3]) == elliptic.EXPECTED


def test_lib224_mds_matches_derivation():
    from genstark_tpu.stdlib import lib224_source
    field = create_prime_field(P224)
    text = lib224_source()
    lines = text.splitlines()
    start = next(i for i, l in enumerate(lines) if "(const $mds matrix" in l)
    literal = [[int(v) for v in re.findall(r"\d+", lines[start + 1 + r])]
               for r in range(3)]
    assert get_mds_matrix(field.host, 3) == literal


def test_lib224_poseidon_hash_matches_oracle():
    field, oracle = assembly_lib.poseidon_oracle("224")
    schema = compile_assembly(_lib224(),
                              "ComputePoseidonHash")
    rows = host_trace(schema, [[42], [43]])
    control = oracle([42, 43])
    assert rows[63][0] == control[0] and rows[63][1] == control[1]


def test_lib224_merkle_root_matches_oracle():
    from examples.poseidon_utils import MerkleTree2, to_binary_array
    field, oracle = assembly_lib.poseidon_oracle("224")
    depth, index = 4, 5
    tree = MerkleTree2(field.prng(b"\x2a", 2 ** depth), oracle)
    branch = tree.prove(index)
    bits = [0] + to_binary_array(index, depth)[:-1]
    schema = compile_assembly(_lib224(),
                              "ComputeMerkleRoot")
    rows = host_trace(schema, [[branch[0]], [branch[1:]], [bits]])
    assert rows[-1][0] == tree.root


def test_schnorr_trace_verifies_signature():
    schema = compile_assembly(_lib224(),
                              "VerifySchnorrSignature")
    g, p, r = (assembly_lib.SCHNORR_G, assembly_lib.SCHNORR_P,
               assembly_lib.SCHNORR_R)
    inputs = [[g[0]], [g[1]], [assembly_lib.to_bits256(assembly_lib.SCHNORR_S)],
              [p[0]], [p[1]], [assembly_lib.to_bits256(assembly_lib.SCHNORR_H)],
              [r[0]], [r[1]]]
    rows = host_trace(schema, inputs)
    assert rows[0][0] == g[0] and rows[0][1] == g[1]
    assert rows[0][7] == p[0] and rows[0][8] == p[1]
    assert rows[0][9] == r[0] and rows[0][10] == r[1]
    assert rows[255][13] == assembly_lib.SCHNORR_H


@pytest.mark.slow
def test_pointmul_prove_verify_device():
    stark, proof, assertions = elliptic.run()
    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    assert stark.verify(assertions, stark.parse(buf))
