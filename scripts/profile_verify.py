"""Profile Stark.verify on a real proof (prove on the default backend once,
then time/cProfile repeated verifications — the verifier is host-only).

Usage: python scripts/profile_verify.py [log2_steps] [--profile]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

if "xla_cpu_use_fusion_emitters" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_use_fusion_emitters=false").strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 17
    steps = 1 << n
    from examples.mimc import make_mimc_stark, run_mimc
    from genstark_tpu.protocol import Assertion

    stark, constants = make_mimc_stark(steps, use_input=True)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]
    t0 = time.monotonic()
    proof = stark.prove(assertions, [[3]])
    print(f"prove {time.monotonic() - t0:.1f}s", flush=True)
    parsed = stark.parse(stark.serialize(proof))

    # warm + time
    best = float("inf")
    for _ in range(7):
        t0 = time.monotonic()
        assert stark.verify(assertions, parsed)
        best = min(best, time.monotonic() - t0)
    print(f"verify best {best * 1000:.1f} ms at 2^{n}", flush=True)

    if "--profile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        for _ in range(5):
            stark.verify(assertions, parsed)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())


if __name__ == "__main__":
    main()
