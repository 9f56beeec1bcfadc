"""Roofline microbenchmarks for the hot kernels (DESIGN_NOTES roofline
section).

Measures, on the current default JAX platform (the real TPU under the
driver; CPU elsewhere):

  1. HBM streaming bandwidth       — u32 add, K passes chained INSIDE one
                                     program (the tunnelled backend has a
                                     ~27 ms dispatch floor and reports
                                     nonsense for trivial one-pass programs,
                                     so every bench amortizes over enough
                                     in-program work to dominate the floor)
  2. VPU Montgomery-multiply rate  — slope of two in-VMEM mont_mul chain
                                     depths (fixed HBM traffic cancels out)
  3. NTT butterflies/s             — the public ntt() path, K transforms
                                     chained in one program
  4. blake2s hash rows/s           — K dependent hash_pairs levels chained

and derives the butterfly kernel's HBM and VPU bounds.  Completion is
forced by fetching a 4-byte slice of the result (block_until_ready alone
under-reports on the tunnelled backend).

Output: one JSON object to stdout; human-readable notes to stderr.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

if "xla_cpu_use_fusion_emitters" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_use_fusion_emitters=false").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DISPATCH_FLOOR_NOTE = ("timings amortize K in-program passes; completion "
                       "forced by a 4-byte fetch")


def _fetch(out):
    x = out[0] if isinstance(out, tuple) else out
    flat = x.reshape(-1)
    return np.asarray(jax.lax.slice(flat, (0,), (1,)))


def _best(fn, *args, runs=5):
    _fetch(fn(*args))                       # compile + first load
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        _fetch(fn(*args))
        best = min(best, time.monotonic() - t0)
    return best


def bench_hbm_bw(n_bytes=1 << 29, k=16):
    """Streaming read+write bandwidth: K chained `y = y + c` passes over
    n_bytes of u32 in ONE program."""
    n = n_bytes // 4
    x = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def f(a):
        return jax.lax.fori_loop(0, k, lambda i, y: y + np.uint32(1), a)

    sec = _best(f, x)
    return k * 2 * n_bytes / sec, sec


def _mont_chain_kernel(field, depth, n):
    """Pallas kernel: `depth` dependent mont_muls per element, in VMEM."""
    from jax.experimental import pallas as pl

    from genstark_tpu.ntt.pallas_kernels import _mont_mul_limbs

    dev = field.device
    L = dev.L
    p_limbs = np.frombuffer(dev._p_np.tobytes(), dtype=np.uint32)
    n0p = np.uint32(int(dev._n0p))
    blk = 2048
    interpret = jax.default_backend() != "tpu"

    def kernel(x_ref, out_ref):
        x = x_ref[...]
        limbs = [x[i] for i in range(L)]
        for _ in range(depth):
            limbs = _mont_mul_limbs(limbs, limbs, p_limbs, n0p)
        out_ref[...] = jnp.stack(limbs)

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=(n // blk,),
            in_specs=[pl.BlockSpec((L, blk), lambda i: (0, i))],
            out_specs=pl.BlockSpec((L, blk), lambda i: (0, i)),
            interpret=interpret,
        )(x)

    return jax.jit(run)


def bench_mont_rate(field, n=1 << 21, d1=16, d2=64):
    """mont_muls/s from the slope between two chain depths (fixed HBM
    traffic and dispatch cost cancel)."""
    dev = field.device
    x = dev.from_ints([3] * n)
    t1 = _best(_mont_chain_kernel(field, d1, n), x)
    t2 = _best(_mont_chain_kernel(field, d2, n), x)
    per_mul = (t2 - t1) / (d2 - d1) / n
    return 1.0 / per_mul, (t1, t2)


def bench_ntt(field, n=1 << 20, k=4):
    """K chained transforms of the public path in one program."""
    from genstark_tpu import ntt
    plan = ntt.get_plan(field, n, False)

    @jax.jit
    def f(a, w_table, panel):
        for _ in range(k):
            if panel is not None:
                a = ntt._four_step_core(field, a, n, w_table, panel=panel)
            else:
                a = ntt.ntt_core_table(field, a, n, w_table)
        return a

    x = field.device.from_ints([3] * n)
    sec = _best(f, x, plan.w_table, plan.panel)
    butterflies = k * (n // 2) * (n.bit_length() - 1)
    return butterflies / sec, sec


def bench_hash_rows(n=1 << 20, k=8):
    """blake2s pair hashing (64-byte rows): K dependent levels chained in
    one program, each level feeding the next's input."""
    from genstark_tpu.hash import Hash
    h = Hash("blake2s256")

    @jax.jit
    def f(a):
        def body(i, a):
            d = h.hash_pairs(a)                          # [8, n/2]
            return a ^ jnp.pad(d, ((0, 0), (0, a.shape[1] - d.shape[1])))
        return jax.lax.fori_loop(0, k, body, a)

    rows = jnp.ones((8, n), dtype=jnp.uint32)
    sec = _best(f, rows)
    return k * (n // 2) / sec, sec


def main():
    from genstark_tpu.field import P128, create_prime_field
    field = create_prime_field(P128)
    L = field.device.L
    plat = jax.devices()[0].platform
    out = {"platform": plat, "method": DISPATCH_FLOOR_NOTE}

    bw, bw_sec = bench_hbm_bw()
    out["hbm_stream_GBps"] = round(bw / 1e9, 1)
    print(f"HBM stream: {bw/1e9:.1f} GB/s ({bw_sec:.4f}s)",
          file=sys.stderr, flush=True)

    rate, (t1, t2) = bench_mont_rate(field)
    out["vpu_mont_muls_per_s"] = round(rate)
    print(f"VPU mont_mul: {rate/1e9:.3f} G muls/s (chain {t1:.4f}/{t2:.4f}s)",
          file=sys.stderr, flush=True)

    for lg in (20, 21):
        bps, sec = bench_ntt(field, 1 << lg)
        out[f"ntt_2^{lg}_butterflies_per_s"] = round(bps)
        print(f"NTT 2^{lg}: {bps/1e6:.1f} M butterflies/s ({sec:.4f}s, x4)",
              file=sys.stderr, flush=True)

    hps, sec = bench_hash_rows()
    out["blake2s_pair_hashes_per_s"] = round(hps)
    print(f"blake2s pairs: {hps/1e6:.2f} M/s ({sec:.4f}s, x8)",
          file=sys.stderr, flush=True)

    # ---- derived bounds for the 128-bit butterfly ----
    # 4-step path: both local transforms stream the data once each through
    # the multi-stage kernel; the twiddle multiply, two transposes and the
    # final reorder are one read+write pass each -> ~6 full passes per
    # transform of log2(n) stages.  One butterfly touches 2 elements of
    # 4*L bytes each, read + write:
    bytes_per_bf_pass = 2 * 2 * 4 * L
    for lg in (20, 21):
        passes = 6
        amort = bytes_per_bf_pass * passes / lg
        out[f"hbm_bound_2^{lg}_butterflies_per_s"] = round(bw / amort)
    out["vpu_bound_butterflies_per_s"] = round(rate)  # 1 mont_mul/butterfly
    for lg in (20, 21):
        got = out[f"ntt_2^{lg}_butterflies_per_s"]
        bound = min(out[f"hbm_bound_2^{lg}_butterflies_per_s"],
                    out["vpu_bound_butterflies_per_s"])
        out[f"ntt_2^{lg}_pct_of_bound"] = round(100 * got / bound, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
