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
import numpy as np

from genstark_tpu.hash import Hash

_K = 16          # dependent levels chained per program


def best(fn, *args, runs=7):
    """Fetch-forced timing (the tunnelled backend misreports trivial
    programs through block_until_ready — same method as roofline.py)."""
    def run():
        out = fn(*args)
        np.asarray(jax.lax.slice(out.reshape(-1), (0,), (1,)))
    run()
    b = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        run()
        b = min(b, time.monotonic() - t0)
    return b


def _chained(h, n):
    """K dependent full-batch hash_pairs levels in ONE program."""
    @jax.jit
    def f(a):
        def body(i, a):
            d = h.hash_pairs(a)                          # [8, n/2]
            return a ^ jnp.pad(d, ((0, 0), (0, a.shape[1] - d.shape[1])))
        return jax.lax.fori_loop(0, _K, body, a)
    return f


def main():
    h = Hash("blake2s256")
    out = {"platform": jax.devices()[0].platform, "alg": "blake2s256",
           "chained_levels": _K, "levels": {}}
    from genstark_tpu.hash import pallas_hash
    for lg in (17, 16, 15, 14, 13, 12, 11):
        n = 1 << lg
        rows = jnp.ones((8, n), dtype=jnp.uint32)

        os.environ["GENSTARK_PALLAS_HASH_MIN"] = "256"
        pallas_hash._min_batch.cache_clear()
        t_pallas = best(_chained(h, n), rows) / _K

        os.environ["GENSTARK_PALLAS_HASH_MIN"] = str(1 << 30)
        pallas_hash._min_batch.cache_clear()
        t_jnp = best(_chained(h, n), rows) / _K

        out["levels"][f"2^{lg}"] = {"pallas_ms": round(t_pallas * 1e3, 3),
                                    "jnp_ms": round(t_jnp * 1e3, 3)}
        print(f"2^{lg}: pallas {t_pallas*1e3:.3f} ms/level, "
              f"jnp {t_jnp*1e3:.3f} ms/level", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
