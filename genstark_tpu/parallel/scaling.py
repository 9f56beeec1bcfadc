"""Scaling-efficiency benchmark harness (SURVEY.md §7.8, BASELINE.json
north star: ops/s scaling efficiency at 1 chip / 1 host / N hosts).

The reference has no parallelism at all (SURVEY.md §2.4); this harness
measures OUR distributed 4-step NTT against the single-device transform.
On real multi-chip hardware it reports ICI scaling efficiency; on a virtual
CPU mesh it validates the wiring (speedups are meaningless there).

Usage:
    python -m genstark_tpu.parallel.scaling            # n = 2^18, all mesh sizes
    BENCH_NTT_N=1048576 python -m genstark_tpu.parallel.scaling
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

import jax

from ..field import P128, PrimeField, create_prime_field
from .. import ntt as ntt_mod
from .mesh import make_mesh
from .ntt_dist import distributed_ntt


def _time_best(fn, n_runs: int = 5) -> float:
    fn()                                   # compile
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def measure_ntt_scaling(field: Optional[PrimeField] = None, n: int = 2 ** 18,
                        mesh_sizes: Optional[List[int]] = None,
                        n_runs: int = 5) -> List[dict]:
    """Times the size-n forward NTT on 1 device and on each mesh size.

    Returns one record per configuration:
      {"devices", "seconds", "butterflies_per_s", "speedup", "efficiency"}
    where efficiency = speedup / devices (1.0 = perfect linear scaling).
    """
    field = field or create_prime_field(P128)
    available = len(jax.devices())
    if mesh_sizes is None:
        mesh_sizes = [d for d in (2, 4, 8, 16, 32) if d <= available]
    x = field.device.from_ints([3] * n)
    butterflies = (n // 2) * (n.bit_length() - 1)

    base = _time_best(
        lambda: ntt_mod.ntt(field, x).block_until_ready(), n_runs)
    out = [{"devices": 1, "seconds": round(base, 5),
            "butterflies_per_s": round(butterflies / base),
            "speedup": 1.0, "efficiency": 1.0}]
    for d in mesh_sizes:
        mesh = make_mesh(d)
        t = _time_best(
            lambda: distributed_ntt(field, x, mesh).block_until_ready(), n_runs)
        out.append({"devices": d, "seconds": round(t, 5),
                    "butterflies_per_s": round(butterflies / t),
                    "speedup": round(base / t, 3),
                    "efficiency": round(base / t / d, 3)})
    return out


def comm_compute_split(n: int, devices: int,
                       ici_gbps: float = 45.0,
                       bf_per_s: float = 4.7e9) -> dict:
    """The ANALYTIC compute/communication split of the distributed 4-step
    NTT — meaningful even when the wall-clock runs on a virtual CPU mesh
    (where measured efficiencies are noise: CPU 'collectives' are memcpys
    and local compute shares one socket).

    The transform does exactly ONE all-to-all of the full [L, n] residue
    array (the 4-step transpose); everything else is local butterflies and
    one twiddle pass.  Per device: moves (D-1)/D of its n/D shard once.
    Projection constants: ici_gbps = per-chip ICI bandwidth (v5e ~45 GB/s
    effective per direction), bf_per_s = measured single-chip NTT rate
    (BENCH ntt128 north star; round 5: 4.7e9)."""
    L = 8
    elem_bytes = L * 4
    shard_elems = n // devices
    a2a_bytes_per_dev = shard_elems * elem_bytes * (devices - 1) // devices
    butterflies = (n // 2) * (n.bit_length() - 1)
    t_compute = butterflies / devices / bf_per_s
    t_comm = a2a_bytes_per_dev / (ici_gbps * 1e9)
    return {
        "devices": devices,
        "all_to_all_bytes_per_device": a2a_bytes_per_dev,
        "all_to_all_count": 1,
        "projected_compute_s": round(t_compute, 6),
        "projected_ici_comm_s": round(t_comm, 6),
        "projected_efficiency": round(t_compute / (t_compute + t_comm), 4),
        "model": f"ici {ici_gbps} GB/s, {bf_per_s:.2e} butterflies/s/chip",
    }


def main():
    n = int(os.environ.get("BENCH_NTT_N", 2 ** 18))
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # self-provision a virtual mesh (both knobs must be set before the
        # backend initializes; harmless no-op otherwise)
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices",
                              int(os.environ.get("SCALING_DEVICES", 8)))
        except Exception:
            pass
    backend = jax.default_backend()
    for record in measure_ntt_scaling(n=n):
        d = record["devices"]
        if backend != "tpu":
            record["note"] = ("virtual CPU mesh: wall-clock efficiency is "
                              "noise; see the analytic split")
        if d > 1:
            record["split"] = comm_compute_split(n, d)
        print(json.dumps(record))


if __name__ == "__main__":
    main()
