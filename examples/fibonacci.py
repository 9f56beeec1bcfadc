"""Fibonacci STARK (/root/reference/examples/demo/fibonacci.ts): 2 registers
over p32, r0' = r0 + r1, r1' = r0 + 2*r1 (two Fibonacci numbers per step)."""

from __future__ import annotations

from genstark_tpu import instantiate
from genstark_tpu.air import AirSchema, InputRegister
from genstark_tpu.air.ir import nxt, static, trace
from genstark_tpu.field import P32, create_prime_field
from genstark_tpu.protocol import Assertion

# expected results from the reference (fibonacci.ts:9-11)
EXPECTED = {2 ** 6: 1783540607, 2 ** 13: 203257732, 2 ** 17: 2391373091}


def make_fib_stark(steps: int, options: dict = None, logger=None):
    field = create_prime_field(P32)
    schema = AirSchema(
        field=field,
        trace_width=2,
        static_registers=[InputRegister(secret=True)],
        init=[static(0), static(0)],
        transition=[trace(0) + trace(1), trace(0) + 2 * trace(1)],
        constraints=[nxt(0) - (trace(0) + trace(1)),
                     nxt(1) - (trace(0) + 2 * trace(1))],
        base_steps=steps,
        name="fibonacci",
    )
    return instantiate(schema, options=options, logger=logger)


def run_fibonacci(field, steps: int, start: int):
    a = b = start
    trace_rows = [(a, b)]
    for _ in range(steps - 1):
        a, b = field.add(a, b), field.add(a, field.mul(2, b))
        trace_rows.append((a, b))
    return trace_rows


def run(steps: int = 2 ** 6, options: dict = None, logger=None):
    stark = make_fib_stark(steps, options, logger)
    field = stark.air.field
    controls = run_fibonacci(field, steps, 1)
    assertions = [Assertion(step=0, register=0, value=1),
                  Assertion(step=0, register=1, value=1),
                  Assertion(step=steps - 1, register=1, value=controls[-1][1])]
    if steps in EXPECTED:
        assert controls[-1][1] == EXPECTED[steps], "oracle does not match reference"
    proof = stark.prove(assertions, [[1]])
    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    assert stark.verify(assertions, stark.parse(buf))
    return {"proof_bytes": len(buf), "security_level": stark.security_level}


if __name__ == "__main__":
    import json
    print(json.dumps(run()))
