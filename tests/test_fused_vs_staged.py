"""The fused single-program prover and the staged pipeline must produce
byte-identical proofs: both follow the same transcript, so any divergence
is a bug in one of them."""

from genstark_tpu import instantiate
from genstark_tpu.air import AirSchema
from genstark_tpu.air.ir import const, nxt, static, trace
from genstark_tpu.air.ir import CyclicRegister
from genstark_tpu.field import P32, create_prime_field
from genstark_tpu.protocol import Assertion


def _foo_stark(steps=64):
    field = create_prime_field(P32)
    schema = AirSchema(
        field=field,
        trace_width=1,
        static_registers=[CyclicRegister([1, 2, 3, 4])],
        init=[const(3)],
        transition=[trace(0) + const(2) + static(0)],
        constraints=[nxt(0) - (trace(0) + const(2) + static(0))],
        base_steps=steps,
        name="foo",
    )
    return instantiate(schema, options={"extension_factor": 8,
                                        "exe_query_count": 10,
                                        "fri_query_count": 6})


def test_fused_and_staged_proofs_are_identical():
    stark = _foo_stark()
    # control values: r' = r + 2 + k(cyclic)
    ks = [1, 2, 3, 4]
    v = 3
    vals = [v]
    for t in range(63):
        v = (v + 2 + ks[t % 4]) % stark.air.field.modulus
        vals.append(v)
    assertions = [Assertion(0, 0, vals[0]), Assertion(63, 0, vals[63])]

    fused = stark.prove(assertions)
    staged = stark.prove_staged(assertions)
    assert stark.serialize(fused) == stark.serialize(staged)
    assert stark.verify(assertions, fused)
