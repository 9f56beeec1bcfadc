"""Native C++ trace generator vs the Python interpreter (bit-exactness).

The native path replaces the reference's generated-JS `generateExecutionTrace`
(/root/reference/lib/Stark.ts:97) with g++-compiled code; both paths must
produce identical traces, so any example proof exercises parity implicitly.
Here we check the codegen directly across fields and operators, plus the
module-level wiring.
"""

import random

import numpy as np
import pytest

from genstark_tpu.air.ir import compile_host_fn, seed as seedv, static, trace
from genstark_tpu.field import P32, P64, P128, P224, P256


def _limbs_to_int(row, lc):
    return sum(int(row[i]) << (64 * i) for i in range(lc))


@pytest.mark.parametrize("p", [P32, P64, P128, P224, P256])
def test_native_matches_python_interpreter(p):
    from genstark_tpu.native.tracegen import native_trace_fn
    lc = max(1, (p.bit_length() + 63) // 64)
    T = 64
    rng = random.Random(7)
    init = [seedv(0), seedv(0) + 2]
    # exercises add/sub/mul/div/exp/neg and both static registers
    transition = [
        trace(0) ** 3 + static(0),
        trace(1) * trace(0) - static(1) + (static(0) / (trace(1) + 1)) - (-trace(0)),
    ]
    cols = [[rng.randrange(p) for _ in range(T)] for _ in range(2)]
    sd = [rng.randrange(p)]
    run = native_trace_fn(init, transition, p, 1, 2)
    out = run(cols, sd, T)

    init_fn = compile_host_fn(init, p)
    step_fn = compile_host_fn(transition, p)
    state = init_fn([0, 0], [cols[0][0], cols[1][0]], sd)
    for t in range(T):
        for r in range(2):
            assert _limbs_to_int(out[t, r], lc) == state[r], (t, r)
        if t + 1 < T:
            state = step_fn(state, [cols[0][t], cols[1][t]])


def test_module_uses_native_path():
    """ProvingContext.generate_execution_trace native path matches the
    Python-host fallback on a real schema (MiMC-128)."""
    from examples.mimc import make_mimc_stark
    stark, _ = make_mimc_stark(64, use_input=False, constant_count=16)
    ctx = stark.air.init_proving_context([], [3])
    native = ctx._generate_trace_native()
    assert native is not None, "native toolchain should be available in CI image"
    pyhost = ctx._generate_trace_pyhost()
    assert np.array_equal(np.asarray(native), np.asarray(pyhost))
