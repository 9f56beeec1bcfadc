"""AirAssembly frontend tests: parse + elaborate + prove/verify."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genstark_tpu import instantiate
from genstark_tpu.air.assembly import compile_assembly, parse_sexpr, tokenize
from genstark_tpu.air.ir import Const, degree_of
from genstark_tpu.field import P128
from genstark_tpu.protocol import Assertion

from examples.mimc import run_mimc

STEPS = 2 ** 6
MIMC_AA = f"""
(module
    (field prime 340282366920938463463374607393113505793)
    (const $alpha scalar 3)
    (function $mimcRound
        (result vector 1)
        (param $state vector 1) (param $roundKey scalar)
        (add
            (exp (load.param $state) (load.const $alpha))
            (load.param $roundKey)))
    (export mimc
        (registers 1) (constraints 1) (steps {STEPS})
        (static
            (cycle (prng sha256 0x4d694d43 32)))
        (init
            (param $seed vector 1)
            (load.param $seed))
        (transition
            (call $mimcRound (load.trace 0) (get (load.static 0) 0)))
        (evaluation
            (sub
                (load.trace 1)
                (call $mimcRound (load.trace 0) (get (load.static 0) 0))))))
"""


def test_tokenizer_and_reader():
    tree = parse_sexpr(tokenize("(a (b 1 0x2f) # comment\n c)"))
    assert tree == [["a", ["b", "1", "0x2f"], "c"]]


def test_compile_mimc_schema():
    schema = compile_assembly(MIMC_AA, "mimc")
    assert schema.trace_width == 1
    assert schema.base_steps == STEPS
    assert schema.max_constraint_degree == 3
    assert len(schema.static_registers) == 1
    assert len(schema.static_registers[0].values) == 32


def test_mimc_assembly_end_to_end():
    stark = instantiate(MIMC_AA, "mimc",
                        options={"hash_algorithm": "blake2s256",
                                 "extension_factor": 8,
                                 "exe_query_count": 10, "fri_query_count": 6})
    field = stark.air.field
    constants = field.prng(bytes.fromhex("4d694d43"), 32)
    controls = run_mimc(field, STEPS, constants, 3)
    assertions = [Assertion(0, 0, controls[0]), Assertion(STEPS - 1, 0, controls[-1])]
    proof = stark.prove(assertions, [], [3])
    assert proof.i_shapes == []
    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    assert stark.verify(assertions, stark.parse(buf))


def test_lib128_poseidon_schema_compiles():
    from genstark_tpu.stdlib import lib128_source
    schema = compile_assembly(lib128_source(), "ComputePoseidonHash")
    assert schema.trace_width == 6
    assert len(schema.constraints) == 6
    assert len(schema.static_registers) == 12
    # x^5 S-box through the MDS product: degree 5 constraints (plus mask deg)
    assert schema.max_constraint_degree >= 5
    assert schema.base_steps == 64


def test_lib128_merkle_schemas_compile():
    from genstark_tpu.stdlib import lib128_source
    src = lib128_source()
    for name, width in [("ComputeMerkleRoot", 12), ("ComputeMerkleUpdate", 24)]:
        schema = compile_assembly(src, name)
        assert schema.trace_width == width


def test_pointmul_schema_compiles():
    from genstark_tpu.stdlib import pointmul_source
    schema = compile_assembly(pointmul_source())
    assert schema.trace_width == 8
    # (steps 1): each scalar bit spans one step; trace length comes from the
    # 256 input bits at proving time
    assert schema.base_steps == 1
    from genstark_tpu.air.ir import CyclicRegister
    powers = [r for r in schema.static_registers if isinstance(r, CyclicRegister)]
    assert len(powers[0].values) == 256 and powers[0].values[3] == 8
