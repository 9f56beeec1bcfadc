"""Benchmark: MiMC-128 STARK proof at 2^13 steps — the reference's primary
benchmark config (README.md:211: 1.3 s on i5-7300U single thread, WASM).

Runs on the default JAX platform (the real TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_seconds / our_seconds (>1 means faster than the
reference).

Robustness: the tunnelled-TPU backend pays a large one-time per-program
load cost and occasionally stalls on the first transfer, so the driver's
timeout may fire mid-warmup.  A SIGTERM/SIGINT handler emits the best
measurement collected so far (or the warmup-derived value) before exiting,
so a timed-out run still reports a valid JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

if "xla_cpu_use_fusion_emitters" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_use_fusion_emitters=false").strip()

import jax

# Persistent compilation cache (standard JAX feature, and how a production
# deployment of this prover would run): XLA re-compiles of an unchanged
# program are served from disk, so only the first-ever prove of a given
# (AIR, size, options) config on a machine pays the full compile.  The
# emitted JSON reports `warm_cache` so a cached warmup is never mistaken
# for a cold one.
_CACHE_DIR = os.environ.get(
    "GENSTARK_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def _cache_entries():
    try:
        return {e.name for e in os.scandir(_CACHE_DIR)}
    except OSError:
        return set()


if _CACHE_DIR != "0":
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _cache_before = _cache_entries()
else:
    _cache_before = set()


def _warm_cache() -> bool:
    """True only when THIS config's programs were served from the cache: the
    cache dir was non-empty at start AND the warmup compile wrote no new
    entries.  A cold config on a warm dir writes its programs during warmup
    and is correctly reported cold (a non-empty dir alone says nothing about
    the current (AIR, steps, options) tuple)."""
    if not _cache_before:
        return False
    return len(_cache_entries() - _cache_before) == 0

# reference MiMC-128 proof times by trace length (README.md:211-212)
BASELINES = {2 ** 13: 1.3, 2 ** 17: 23.0}


def _baseline(steps: int) -> float:
    if steps in BASELINES:
        return BASELINES[steps]
    # README scaling is ~linear in steps between the two published points
    return 1.3 * steps / 2 ** 13


_state = {"best": None, "printed": False, "steps": 2 ** 13,
          "proof_kb": None, "security": None, "warmup_s": None,
          "verify_ms": None}


def _emit(note=None):
    if _state["printed"] or _state["best"] is None:
        return
    _state["printed"] = True
    steps = _state["steps"]
    best = _state["best"]
    out = {
        "metric": f"mimc128_2^{steps.bit_length() - 1}_proof_time",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(_baseline(steps) / best, 3),
        "proof_kb": _state["proof_kb"],
        "security_level": _state["security"],
        "platform": jax.devices()[0].platform,
        "warmup_s": _state["warmup_s"],
        "warm_cache": _warm_cache(),
        "verify_ms": _state["verify_ms"],
    }
    if steps not in BASELINES:
        # the reference published only 2^13 and 2^17; other sizes compare
        # against a linear extrapolation of its scaling
        out["baseline_extrapolated"] = True
    if note:
        out["note"] = note
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):
    _emit(note=f"interrupted by signal {signum} mid-run")
    sys.exit(0 if _state["printed"] else 1)


def bench_ntt():
    """North-star kernel metric (BASELINE.json): NTT butterflies/s/chip over
    the 128-bit field.  BENCH_NTT_N sets the transform size (default 2^20).

    K transforms are chained inside ONE program and completion is forced by
    a 4-byte fetch: the tunnelled backend has a ~27 ms dispatch floor and
    block_until_ready alone under-reports trivial programs (same method as
    scripts/roofline.py)."""
    import jax.numpy as jnp
    import numpy as np
    from genstark_tpu import ntt
    from genstark_tpu.field import P128, create_prime_field

    n = int(os.environ.get("BENCH_NTT_N", 2 ** 20))
    # 64 chained transforms ~ 140 ms at 2^20: comfortably amortizes the
    # ~27 ms tunnel dispatch floor (16 no longer does at the round-5
    # digit-native rates of ~2.2 ms per 2^20 transform)
    k = int(os.environ.get("BENCH_NTT_CHAIN", 64))
    field = create_prime_field(P128)
    plan = ntt.get_plan(field, n, False)

    @jax.jit
    def f(a, w_table, panel, mxu_tabs):
        for _ in range(k):
            if mxu_tabs is not None:
                a = ntt.mxu_transform_core(field, a, n, mxu_tabs)
            elif panel is not None:
                a = ntt._four_step_core(field, a, n, w_table, panel=panel)
            else:
                a = ntt.ntt_core_table(field, a, n, w_table)
        return a

    def run(x):
        out = f(x, plan.w_table, plan.panel, plan.mxu)
        np.asarray(jax.lax.slice(out.reshape(-1), (0,), (1,)))  # force
        return out

    x = field.device.from_ints([3] * n)
    run(x)                                          # compile + load
    n_runs = int(os.environ.get("BENCH_RUNS", 5))
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.monotonic()
        run(x)
        best = min(best, time.monotonic() - t0)
    butterflies = k * (n // 2) * (n.bit_length() - 1)
    print(json.dumps({
        "metric": f"ntt128_2^{n.bit_length() - 1}_butterflies_per_s",
        "value": round(butterflies / best),
        "unit": "butterflies/s/chip",
        "seconds": round(best, 4),
        "chained_transforms": k,
        "vs_baseline": None,
        "platform": jax.devices()[0].platform,
    }), flush=True)


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    if os.environ.get("BENCH_MODE") == "ntt":
        bench_ntt()
        return

    steps = int(os.environ.get("BENCH_STEPS", 2 ** 13))
    _state["steps"] = steps
    from examples.mimc import make_mimc_stark, run_mimc
    from genstark_tpu.protocol import Assertion

    t0 = time.monotonic()
    stark, constants = make_mimc_stark(steps, use_input=True)
    field = stark.air.field
    controls = run_mimc(field, steps, constants, 3)
    assertions = [Assertion(0, 0, controls[0]),
                  Assertion(steps - 1, 0, controls[-1])]
    print(f"setup {time.monotonic() - t0:.1f}s", file=sys.stderr, flush=True)

    # warmup (compiles the fused program; one-time)
    t0 = time.monotonic()
    proof = stark.prove(assertions, [[3]])
    warm = time.monotonic() - t0
    print(f"warmup(prove#1) {warm:.1f}s", file=sys.stderr, flush=True)
    _state["best"] = warm
    _state["warmup_s"] = round(warm, 1)
    _state["proof_kb"] = round(stark.size_of(proof) / 1024, 2)
    _state["security"] = stark.security_level
    parsed = stark.parse(stark.serialize(proof))
    t0 = time.monotonic()
    assert stark.verify(assertions, parsed)
    _state["verify_ms"] = round((time.monotonic() - t0) * 1000, 1)
    print(f"verified ({_state['verify_ms']} ms)", file=sys.stderr, flush=True)

    # measure (best-of-N: the tunnelled backend has +-20% run-to-run
    # variance, so a single draw under-reports the achievable time)
    n_runs = int(os.environ.get("BENCH_RUNS", 5))
    for i in range(n_runs):
        t0 = time.monotonic()
        proof = stark.prove(assertions, [[3]])
        dt = time.monotonic() - t0
        _state["best"] = min(_state["best"], dt)
        print(f"run#{i + 1} {dt:.3f}s", file=sys.stderr, flush=True)

    _emit()


if __name__ == "__main__":
    main()
