"""Measure the VPU u32 lane-op ceiling with a pure in-VMEM op chain — the
denominator for the hash roofline (% of bound for blake2s/sha256, stated
the same way the NTT roofline states % of int8 MXU peak)."""

from __future__ import annotations

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 512            # chained ops per element per kernel pass
PASSES = 64


def _kernel(x_ref, o_ref, *, mix):
    v = x_ref[...]
    w = v ^ np.uint32(0x9E3779B9)
    for i in range(K // 4):
        # 4 dependent ops per iter: add, xor, rotr16-ish (shift+or counts
        # as 2); matches the blake2s G-function op mix
        v = v + w
        v = v ^ (w >> np.uint32(7))
        v = (v >> np.uint32(16)) | (v << np.uint32(16))
        w = w + v
    o_ref[...] = v


def main():
    shape = (8, 1 << 16)
    x = jnp.asarray(np.random.randint(0, 1 << 31, shape, dtype=np.uint32))
    call = pl.pallas_call(
        partial(_kernel, mix=0),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        in_specs=[pl.BlockSpec((8, 2048), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 2048), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        grid=(shape[1] // 2048,),
    )

    @jax.jit
    def run(x):
        for _ in range(PASSES):
            x = call(x)
        return x

    def fetch(o):
        return np.asarray(jax.lax.slice(o.reshape(-1), (0,), (1,)))

    fetch(run(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.monotonic()
        fetch(run(x))
        best = min(best, time.monotonic() - t0)
    # ~5 u32 lane-ops per unrolled iteration (add, xor+shift, 2xshift+or
    # fused as roll? counted conservatively as 5)
    ops = shape[0] * shape[1] * PASSES * (K // 4) * 5
    print(json.dumps({"u32_lane_ops_per_s": round(ops / best),
                      "seconds": round(best, 4), "counted_ops": ops}))


if __name__ == "__main__":
    main()
