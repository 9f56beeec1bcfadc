"""Static-variables demo (/root/reference/examples/demo/staticVariables.ts):
field 96769, two cyclic statics k0 (period 4) and k1 (period 8),
transition v' = v + 1 + k0 + 2*k1, 64 steps, expected result 780."""

from __future__ import annotations

from genstark_tpu import instantiate
from genstark_tpu.air import AirSchema, CyclicRegister, InputRegister
from genstark_tpu.air.ir import nxt, static, trace
from genstark_tpu.field import create_prime_field
from genstark_tpu.protocol import Assertion

MODULUS = 96769
EXPECTED_RESULT = 780


def make_demo_stark(steps: int = 64, options: dict = None, logger=None):
    field = create_prime_field(MODULUS)
    schema = AirSchema(
        field=field,
        trace_width=1,
        static_registers=[CyclicRegister([1, 2, 3, 4]),
                          CyclicRegister([1, 2, 3, 4, 5, 6, 7, 8]),
                          InputRegister(secret=True)],
        init=[static(2)],
        transition=[trace(0) + 1 + static(0) + 2 * static(1)],
        constraints=[nxt(0) - (trace(0) + 1 + static(0) + 2 * static(1))],
        base_steps=steps,
        name="demo",
    )
    return instantiate(schema, options=options, logger=logger)


def run_demo(field, steps: int, start: int):
    k0 = [1, 2, 3, 4]
    k1 = [1, 2, 3, 4, 5, 6, 7, 8]
    vals = [start]
    for i in range(steps - 1):
        vals.append(field.add(vals[i], 1 + k0[i % 4] + 2 * k1[i % 8]))
    return vals


def run(steps: int = 64, options: dict = None, logger=None):
    stark = make_demo_stark(steps, options, logger)
    field = stark.air.field
    controls = run_demo(field, steps, 1)
    if steps == 64:
        assert controls[-1] == EXPECTED_RESULT, "oracle mismatch vs reference table"
    assertions = [Assertion(step=0, register=0, value=1),
                  Assertion(step=steps - 1, register=0, value=controls[-1])]
    proof = stark.prove(assertions, [[1]])
    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    assert stark.verify(assertions, stark.parse(buf))
    return {"proof_bytes": len(buf), "security_level": stark.security_level}


if __name__ == "__main__":
    import json
    print(json.dumps(run()))
