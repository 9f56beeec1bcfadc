"""Benchmark: MiMC-128 STARK proof at 2^13 steps — the reference's primary
benchmark config (README.md:211: 1.3 s on i5-7300U single thread, WASM).

Runs on the default JAX platform (the real TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_seconds / our_seconds (>1 means faster than the
reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

if "xla_cpu_use_fusion_emitters" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_use_fusion_emitters=false").strip()

# persistent compile cache so repeat bench runs skip TPU compilation
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/genstark_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_SECONDS = 1.3   # README.md:211


def main():
    steps = int(os.environ.get("BENCH_STEPS", 2 ** 13))
    from examples.mimc import make_mimc_stark, run_mimc
    from genstark_tpu.protocol import Assertion

    stark, constants = make_mimc_stark(steps, use_input=True)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]

    # warmup (compiles everything; cached for later runs)
    proof = stark.prove(assertions, [[3]])
    assert stark.verify(assertions, stark.parse(stark.serialize(proof)))

    # measure
    n_runs = int(os.environ.get("BENCH_RUNS", 3))
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.monotonic()
        proof = stark.prove(assertions, [[3]])
        best = min(best, time.monotonic() - t0)

    size_kb = stark.size_of(proof) / 1024
    print(json.dumps({
        "metric": f"mimc128_2^{steps.bit_length() - 1}_proof_time",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / best, 3),
        "proof_kb": round(size_kb, 2),
        "security_level": stark.security_level,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
