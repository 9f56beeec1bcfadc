"""Roofline microbenchmarks for the hot kernels (DESIGN_NOTES roofline
section; VERDICT round-1 item 7).

Measures, on the current default JAX platform (the real TPU under the
driver; CPU elsewhere):

  1. HBM streaming bandwidth       — u32 add over a ~1 GB array
  2. VPU Montgomery-multiply rate  — slope of a K-deep in-VMEM mont_mul
                                     chain (HBM traffic cancels out)
  3. NTT butterflies/s             — the public ntt() path at 2^20/2^21
  4. blake2s leaf-hash rows/s      — the Pallas tree-hash kernel

and derives the two bounds for the butterfly kernel:

  HBM bound = BW / (bytes moved per butterfly, amortized over the
              multi-stage kernel's stages-per-pass)
  VPU bound = mont_mul rate / mont_muls per butterfly (1)
              (the add/sub/select ops ride along: they are counted by
              measuring the chain INSIDE the same kernel style)

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


def _best(fn, *args, runs=5):
    out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn(*args)
        (out[0] if isinstance(out, tuple) else out).block_until_ready()
        best = min(best, time.monotonic() - t0)
    return best


def bench_hbm_bw(n_bytes=1 << 30):
    """Streaming read+write bandwidth: y = x + 1 over n_bytes of u32."""
    n = n_bytes // 4
    x = jnp.zeros((n,), dtype=jnp.uint32)
    f = jax.jit(lambda a: a + np.uint32(1))
    sec = _best(f, x)
    return 2 * n_bytes / sec, sec


def _mont_chain_kernel(field, depth, n):
    """Pallas kernel: `depth` dependent mont_muls per element, in VMEM."""
    from jax.experimental import pallas as pl

    from genstark_tpu.ntt.pallas_kernels import _mont_mul_limbs

    dev = field.device
    L = dev.L
    p_limbs = np.frombuffer(dev._p_np.tobytes(), dtype=np.uint32)
    n0p = np.uint32(int(dev._n0p))
    blk = 2048

    def kernel(x_ref, out_ref):
        x = x_ref[...]
        limbs = [x[i] for i in range(L)]
        for _ in range(depth):
            limbs = _mont_mul_limbs(limbs, limbs, p_limbs, n0p)
        out_ref[...] = jnp.stack(limbs)

    interpret = jax.default_backend() != "tpu"

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


def bench_mont_rate(field, n=1 << 21, d1=4, d2=12):
    """mont_muls/s from the slope between two chain depths (fixed HBM
    traffic cancels)."""
    dev = field.device
    x = dev.from_ints([3] * n)
    t1 = _best(_mont_chain_kernel(field, d1, n), x)
    t2 = _best(_mont_chain_kernel(field, d2, n), x)
    per_mul = (t2 - t1) / (d2 - d1) / n
    return 1.0 / per_mul, (t1, t2)


def bench_ntt(field, n=1 << 21):
    from genstark_tpu import ntt
    x = field.device.from_ints([3] * n)
    f = functools.partial(ntt.ntt, field)
    sec = _best(f, x)
    butterflies = (n // 2) * (n.bit_length() - 1)
    return butterflies / sec, sec


def bench_hash_rows(n=1 << 20):
    """blake2s leaf hashing (64-byte rows): rows/s through the device path
    used by the Merkle tree."""
    from genstark_tpu.hash import Hash
    h = Hash("blake2s256")
    rows = jnp.zeros((8, n), dtype=jnp.uint32)   # word-major digests [8, n]
    f = jax.jit(h.hash_pairs)
    sec = _best(f, rows)
    return (n // 2) / sec, sec


def main():
    from genstark_tpu.field import P128, create_prime_field
    field = create_prime_field(P128)
    L = field.device.L
    plat = jax.devices()[0].platform
    out = {"platform": plat}

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
        print(f"NTT 2^{lg}: {bps/1e6:.1f} M butterflies/s ({sec:.4f}s)",
              file=sys.stderr, flush=True)

    hps, sec = bench_hash_rows()
    out["blake2s_pair_hashes_per_s"] = round(hps)
    print(f"blake2s pairs: {hps/1e6:.2f} M/s ({sec:.4f}s)",
          file=sys.stderr, flush=True)

    # ---- derived bounds for the 128-bit butterfly ----
    # multi-stage kernel: stages with half-size m <= _MBLK run in ONE HBM
    # pass; each remaining stage is its own pass.  One butterfly touches 2
    # elements of 4*L bytes each, read + write:
    from genstark_tpu.ntt.pallas_kernels import _MBLK
    bytes_per_bf_pass = 2 * 2 * 4 * L
    fused_stages = _MBLK.bit_length()        # stages m = 1 .. _MBLK
    for lg in (20, 21):
        n_stages = lg
        fused = min(fused_stages, n_stages)
        passes = 1 + (n_stages - fused)
        amort = bytes_per_bf_pass * passes / n_stages
        out[f"hbm_bound_2^{lg}_butterflies_per_s"] = round(bw / amort)
    out["vpu_bound_butterflies_per_s"] = round(rate)  # 1 mont_mul/butterfly
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
