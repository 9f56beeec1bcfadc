"""Sweep GENSTARK_PALLAS_HASH_MIN (VERDICT r2 task 8): measure, on the real
chip, the steady-state cost of hashing Merkle levels with the Pallas kernel
vs the jnp compressors as a function of batch size, so the min-batch default
is justified by data instead of a guess.

For each batch size B (one Merkle level), times one `hash_pairs` dispatch
through both paths.  The crossover (where Pallas stops winning by more than
the dispatch-noise floor) is the right default: levels below it cost the
same either way at steady state, and skipping them drops one Mosaic kernel
compile per level from the program.

Output: one JSON line; human notes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from genstark_tpu.hash import Hash


def best(fn, *args, runs=7):
    fn(*args).block_until_ready()
    b = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn(*args).block_until_ready()
        b = min(b, time.monotonic() - t0)
    return b


def main():
    h = Hash("blake2s256")
    out = {"platform": jax.devices()[0].platform, "alg": "blake2s256",
           "levels": {}}
    for lg in (17, 16, 15, 14, 13, 12, 11):
        n = 1 << lg
        rows = jnp.zeros((8, n), dtype=jnp.uint32)

        os.environ["GENSTARK_PALLAS_HASH_MIN"] = "256"
        from genstark_tpu.hash import pallas_hash
        pallas_hash._min_batch.cache_clear()
        t_pallas = best(jax.jit(h.hash_pairs), rows)

        os.environ["GENSTARK_PALLAS_HASH_MIN"] = str(1 << 30)
        pallas_hash._min_batch.cache_clear()
        t_jnp = best(jax.jit(h.hash_pairs), rows)

        out["levels"][f"2^{lg}"] = {"pallas_ms": round(t_pallas * 1e3, 2),
                                    "jnp_ms": round(t_jnp * 1e3, 2)}
        print(f"2^{lg}: pallas {t_pallas*1e3:.2f} ms, jnp {t_jnp*1e3:.2f} ms",
              file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
