"""Native C++ trace generator vs the Python interpreter (bit-exactness).

The native path replaces the reference's generated-JS `generateExecutionTrace`
(/root/reference/lib/Stark.ts:97) with g++-compiled code; both paths must
produce identical traces, so any example proof exercises parity implicitly.
Here we check the codegen directly across fields and operators, plus the
module-level wiring and the pattern-compressed statics stream.
"""

import random

import numpy as np
import pytest

from genstark_tpu.air.ir import compile_host_fn, seed as seedv, static, trace
from genstark_tpu.field import P32, P64, P128, P224, P256


def _u16_to_int(out, r, t, l16):
    """out: uint16[R, L16, T] standard-form limbs -> python int."""
    return sum(int(out[r, i, t]) << (16 * i) for i in range(l16))


@pytest.mark.parametrize("p", [P32, P64, P128, P224, P256])
def test_native_matches_python_interpreter(p):
    from genstark_tpu.native.tracegen import native_trace_fn
    l16 = 2 * max(1, (p.bit_length() + 31) // 32)
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
    out = run(cols, sd, T)                       # uint16 [R, L16, T]
    assert out.shape == (2, l16, T) and out.dtype == np.uint16

    init_fn = compile_host_fn(init, p)
    step_fn = compile_host_fn(transition, p)
    state = init_fn([0, 0], [cols[0][0], cols[1][0]], sd)
    for t in range(T):
        for r in range(2):
            assert _u16_to_int(out, r, t, l16) == state[r], (t, r)
        if t + 1 < T:
            state = step_fn(state, [cols[0][t], cols[1][t]])


@pytest.mark.parametrize("span,shift", [(1, 0), (4, 0), (4, -1), (8, 3)])
def test_native_statics_struct_matches_full_columns(span, shift):
    """The pattern-compressed statics stream (values, span, start_pos) must
    produce the same trace as the equivalent full column."""
    from genstark_tpu.native.tracegen import native_trace_fn
    p = P128
    T = 64
    rng = random.Random(11)
    init = [seedv(0)]
    transition = [trace(0) * trace(0) + static(0)]
    n_vals = T // span
    vals = [rng.randrange(p) for _ in range(n_vals)]
    expanded = [v for v in vals for _ in range(span)]
    s = (-shift) % T
    col = expanded[s:] + expanded[:s] if s else expanded   # col[t]=exp[(t-shift)%T]
    sd = [rng.randrange(p)]
    run = native_trace_fn(init, transition, p, 1, 1)
    full = run([col], sd, T)
    struct = run(None, sd, T, statics_struct=[(vals, span, (-shift) % T)])
    assert np.array_equal(full, struct)


def test_module_uses_native_path():
    """ProvingContext.generate_execution_trace native path matches the
    Python-host fallback on a real schema (MiMC-128)."""
    from examples.mimc import make_mimc_stark
    stark, _ = make_mimc_stark(64, use_input=False, constant_count=16)
    ctx = stark.air.init_proving_context([], [3])
    native = ctx._generate_trace_native()
    assert native is not None, "native toolchain should be available in CI image"
    pyhost = ctx._generate_trace_pyhost().astype(np.uint16)
    assert np.array_equal(np.asarray(native), np.asarray(pyhost))


def test_static_column_limbs_structural_build():
    """static_column_limbs (structural repeat/tile/roll build) must equal a
    direct big-int conversion of the full column."""
    from examples.mimc import make_mimc_stark
    from genstark_tpu.field.limbs import ints_to_limbs
    stark, _ = make_mimc_stark(64, use_input=True, constant_count=16)
    ctx = stark.air.init_proving_context([[7]], None)
    L = stark.air.field.device.L
    for k in range(len(ctx.schema.static_registers)):
        direct = ints_to_limbs(ctx.static_columns[k], L)
        assert np.array_equal(ctx.static_column_limbs(k, L), direct), k
