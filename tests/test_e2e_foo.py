"""End-to-end slice: the README 'Foo' STARK (x' = x + 2, 64 steps, p32 —
/root/reference/README.md:18-51).  prove -> serialize -> sizeOf check ->
parse -> verify, plus negative cases.

One module-scoped Stark with light query counts: every test shares the same
compiled fused program (the values differ, the program doesn't), which is
what keeps this file fast on the compile-bound CPU backend.
"""

import pytest

from genstark_tpu import instantiate
from genstark_tpu.air import AirSchema, InputRegister
from genstark_tpu.air.ir import nxt, static, trace
from genstark_tpu.field import P32, create_prime_field
from genstark_tpu.protocol import Assertion, StarkError


def make_foo_stark(**options):
    schema = AirSchema(
        field=create_prime_field(P32),
        trace_width=1,
        static_registers=[InputRegister(secret=True)],
        init=[static(0)],
        transition=[trace(0) + 2],
        constraints=[nxt(0) - (trace(0) + 2)],
        base_steps=64,
        name="Foo",
    )
    return instantiate(schema, options=options)


@pytest.fixture(scope="module")
def stark():
    return make_foo_stark(exe_query_count=12, fri_query_count=8)


def test_foo_prove_verify_roundtrip(stark):
    assertions = [Assertion(step=0, register=0, value=1),
                  Assertion(step=63, register=0, value=127)]
    proof = stark.prove(assertions, [[1]])
    assert proof.i_shapes == [[1]]

    data = stark.serialize(proof)
    assert len(data) == stark.size_of(proof)

    parsed = stark.parse(data)
    assert stark.serialize(parsed) == data

    assert stark.verify(assertions, parsed)


def test_foo_wrong_assertion_rejected_at_prove(stark):
    bad = [Assertion(step=0, register=0, value=1),
           Assertion(step=63, register=0, value=128)]
    with pytest.raises(StarkError):
        stark.prove(bad, [[1]])


def test_foo_verify_rejects_wrong_assertions(stark):
    assertions = [Assertion(step=0, register=0, value=1),
                  Assertion(step=63, register=0, value=127)]
    proof = stark.prove(assertions, [[1]])
    bad = [Assertion(step=0, register=0, value=2),
           Assertion(step=63, register=0, value=127)]
    with pytest.raises(StarkError):
        stark.verify(bad, proof)


def test_foo_verify_rejects_tampered_proof(stark):
    assertions = [Assertion(step=0, register=0, value=1),
                  Assertion(step=63, register=0, value=127)]
    proof = stark.prove(assertions, [[1]])
    data = bytearray(stark.serialize(proof))
    data[5] ^= 1  # flip a bit in the evaluation root
    tampered = stark.parse(bytes(data))
    with pytest.raises(StarkError):
        stark.verify(assertions, tampered)


def test_foo_different_start_value(stark):
    assertions = [Assertion(step=0, register=0, value=5),
                  Assertion(step=63, register=0, value=5 + 126)]
    proof = stark.prove(assertions, [[5]])
    assert stark.verify(assertions, proof)


def test_foo_default_options_security():
    # defaults (exe=80, fri=40) only need option validation, not a prove
    stark = make_foo_stark()
    assert stark.index_generator.exe_query_count == 80
    assert stark.index_generator.fri_query_count == 40
