"""MiMC STARK — the reference's primary benchmark config
(/root/reference/examples/mimc/mimc128.ts: x' = x^3 + k, 64 cyclic round
constants, 128-bit field, blake2s256, ext=16, exe=48, fri=24).

Two variants, mirroring the reference:
- input variant (AirScript mimc128.ts): the seed is a secret input register;
- assembly variant (mimc128Assembly.ts): the seed is an init-time parameter
  and the proof carries no input shapes.
"""

from __future__ import annotations

from genstark_tpu import instantiate
from genstark_tpu.air import AirSchema, CyclicRegister, InputRegister
from genstark_tpu.air.ir import nxt, seed, static, trace
from genstark_tpu.field import P128, P256, create_prime_field
from genstark_tpu.protocol import Assertion

MIMC_SEED = bytes.fromhex("4d694d43")   # 'MiMC'


def round_constants(field, count: int = 64):
    """64 cyclic round constants from the sha256-counter PRNG (the reference
    uses air-assembly `prng.sha256(0x4d694d43, 64, field)` —
    /root/reference/examples/mimc/mimc128.ts:15)."""
    return field.prng(MIMC_SEED, count)


def run_mimc(field, steps: int, constants, seed_value: int):
    """Control-value oracle (/root/reference/examples/mimc/utils.ts:7-15)."""
    result = [seed_value % field.modulus]
    for i in range(steps - 1):
        result.append(field.add(field.exp(result[i], 3), constants[i % len(constants)]))
    return result


def make_mimc_stark(steps: int, modulus: int = P128, use_input: bool = True,
                    constant_count: int = 64, options: dict = None, logger=None):
    field = create_prime_field(modulus)
    constants = round_constants(field, constant_count)
    statics = [CyclicRegister(constants)]
    if use_input:
        statics.append(InputRegister(secret=True))
        init = [static(1)]
    else:
        init = [seed(0)]
    schema = AirSchema(
        field=field,
        trace_width=1,
        static_registers=statics,
        init=init,
        transition=[trace(0) ** 3 + static(0)],
        constraints=[nxt(0) - (trace(0) ** 3 + static(0))],
        base_steps=steps,
        name="mimc",
    )
    default_options = {"hash_algorithm": "blake2s256", "extension_factor": 16,
                       "exe_query_count": 48, "fri_query_count": 24}
    default_options.update(options or {})
    return instantiate(schema, options=default_options, logger=logger), constants


def run(steps: int = 2 ** 13, modulus: int = P128, use_input: bool = True,
        seed_value: int = 3, options: dict = None, logger=None, check: bool = True):
    """Prove + serialize + parse + verify one MiMC STARK; returns stats."""
    stark, constants = make_mimc_stark(steps, modulus, use_input,
                                       constant_count=min(64, steps // 2),
                                       options=options, logger=logger)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, seed_value)
    assertions = [Assertion(step=0, register=0, value=controls[0]),
                  Assertion(step=steps - 1, register=0, value=controls[-1])]
    import time
    t0 = time.monotonic()
    if use_input:
        proof = stark.prove(assertions, [[seed_value]])
    else:
        proof = stark.prove(assertions, [], [seed_value])
    prove_s = time.monotonic() - t0

    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    parsed = stark.parse(buf)
    t0 = time.monotonic()
    if check:
        assert stark.verify(assertions, parsed)
    verify_s = time.monotonic() - t0
    return {"prove_s": prove_s, "verify_s": verify_s, "proof_bytes": len(buf),
            "security_level": stark.security_level}


if __name__ == "__main__":
    import json
    import sys
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2 ** 13
    from genstark_tpu.utils import Logger
    stats = run(steps, logger=Logger())
    print(json.dumps(stats))


MIMC_SCRIPT = """
define MiMC over prime field (2^128 - 9 * 2^32 + 1) {{
    const alpha: 3;
    static roundConstant: cycle prng(sha256, 0x4d694d43, 64);
    secret input startValue: element[1];
    transition 1 register {{
        for each (startValue) {{
            init {{ yield startValue; }}
            for steps [1..{last}] {{ yield $r0^3 + roundConstant; }}
        }}
    }}
    enforce 1 constraint {{
        for all steps {{ enforce transition($r) = $n; }}
    }}
}}"""


def make_mimc_stark_script(steps: int = 2 ** 13, options: dict = None,
                           logger=None):
    """The AirScript variant — the literal source of
    /root/reference/examples/mimc/mimc128.ts:32-57."""
    from genstark_tpu import instantiate_script
    default_options = {"hash_algorithm": "blake2s256", "extension_factor": 16,
                       "exe_query_count": 48, "fri_query_count": 24}
    default_options.update(options or {})
    src = MIMC_SCRIPT.format(last=steps - 1)
    return instantiate_script(src, default_options, logger)
