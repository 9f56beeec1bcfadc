"""Per-level MXU microbench: kernel-only vs full-path (encode + transpose +
kernel) rates by level size m, plus whole-transform times.  Times amortize
K chained in-program passes; completion forced by a 4-byte fetch."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from genstark_tpu import ntt
from genstark_tpu.field import P128, create_prime_field
from genstark_tpu.ntt import mxu


def fetch(x):
    return np.asarray(jax.lax.slice(x.reshape(-1).astype(jnp.uint32),
                                    (0,), (1,)))


def best(fn, *args, runs=5):
    fetch(fn(*args))
    b = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fetch(fn(*args))
        b = min(b, time.monotonic() - t0)
    return b


def main():
    field = create_prime_field(P128)
    n_total = int(os.environ.get("LEVEL_N", 1 << 20))
    K = int(os.environ.get("LEVEL_K", 64))
    out = {"n_total": n_total, "K": K, "levels": []}
    for m in (64, 128, 256, 512):
        B = n_total // m
        root = field.host.get_root_of_unity(m)
        w8 = jnp.asarray(mxu.w_digits(field, m, root))
        x8 = jnp.asarray(np.random.randint(-100, 100, (mxu.D128, m, B),
                                           dtype=np.int8))

        @jax.jit
        def kern_only(w8, x8):
            o = x8
            for _ in range(K):
                o = mxu.run_dft_level(field, w8, o, m, 1, None,
                                      out_digits=True)
            return o

        @jax.jit
        def full_path(w8, x8):
            # digits -> kernel -> digit output -> transpose (the inter-level
            # data movement) -> next level input
            o = x8
            for _ in range(K):
                o = mxu.run_dft_level(field, w8, o, m, 1, None,
                                      out_digits=True)
                o = jnp.transpose(o.reshape(mxu.D128, m, B // 128, 128),
                                  (0, 2, 1, 3)).reshape(mxu.D128, m, B)
            return o

        t_k = best(kern_only, w8, x8)
        t_f = best(full_path, w8, x8)
        macs = K * n_total * m * mxu.D128 ** 2
        out["levels"].append({
            "m": m,
            "kernel_T_MACs": round(macs / t_k / 1e12, 1),
            "fullpath_T_MACs": round(macs / t_f / 1e12, 1),
            "kernel_ms_per_pass": round(t_k / K * 1000, 3),
            "transpose_ms_per_pass": round((t_f - t_k) / K * 1000, 3),
        })
        print(out["levels"][-1], file=sys.stderr, flush=True)

    # whole transforms
    for n in (1 << 17, 1 << 20, 1 << 21, 1 << 24):
        plan = ntt.get_plan(field, n, False)
        if plan.mxu is None:
            continue
        kk = max(2, (1 << 26) // n)

        @jax.jit
        def tr(a, tabs):
            for _ in range(kk):
                a = ntt.mxu_transform_core(field, a, n, tabs)
            return a

        x = field.device.from_ints([3] * n)
        t = best(tr, x, plan.mxu, runs=3)
        bf = kk * (n // 2) * (n.bit_length() - 1) / t
        out["levels"].append({"n": f"2^{n.bit_length()-1}",
                              "levels": ntt.mxu_levels(n),
                              "ms": round(t / kk * 1000, 2),
                              "butterflies_per_s": round(bf)})
        print(out["levels"][-1], file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
