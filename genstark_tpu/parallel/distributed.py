"""Multi-process (multi-host) wiring for the sharded prover.

The reference is a single-threaded Node.js process with no distribution of
any kind (SURVEY.md section 2.4); this module is the TPU-native scaling
design mandated by BASELINE.json's north star (>=80% NTT scaling at 2
hosts): `jax.distributed` process groups + one global `Mesh` spanning every
chip of every host, with the prover's collectives (4-step NTT all-to-all,
halo roll, FRI stride transposes, Merkle reductions) compiled by XLA to run
over ICI within a slice and DCN across hosts.

Launch recipe (real hardware, one process per host):

    # host 0                                   # host 1
    python prove_job.py --process-id 0         python prove_job.py --process-id 1

    # inside prove_job.py:
    from genstark_tpu.parallel import distributed
    distributed.initialize("10.0.0.1:8476", num_processes=2,
                           process_id=args.process_id)
    mesh = distributed.global_mesh()           # all chips, both hosts
    stark.set_mesh(mesh)
    proof = stark.prove(assertions, inputs)    # identical on every process

On TPU pods `jax.distributed.initialize()` can also infer every argument
from the TPU metadata, so `initialize()` with no arguments is enough there.

The CPU analog (used by scripts/dist_dryrun.py and CI): each process forces
the CPU backend with K virtual devices, giving a num_processes*K-device
global mesh whose cross-process collectives run over Gloo/TCP — the same
program and sharding code paths as a DCN-connected pod, minus the hardware.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None) -> None:
    """Join (or create) a jax.distributed process group.

    local_device_count: when set, force the CPU backend with that many
    virtual devices per process BEFORE the backend initializes (the
    multi-host-on-CPU test analog; leave None on real TPU hosts).
    """
    import jax
    if local_device_count is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis_name: str = "shard"):
    """1-D mesh over every device of every process (devices are ordered by
    process, so contiguous domain shards land process-locally and the NTT
    all-to-all crosses DCN only once per transform)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis_name,))


def fetch(x) -> np.ndarray:
    """Device array -> host numpy, safe under multi-process meshes.

    Single-process: a plain transfer.  Multi-process: the array may not be
    fully addressable from this process (e.g. a root digest pinned to
    another host's device), so it is first allgathered into a replicated
    value — every process returns the same bytes, which is what makes the
    prover's host transcript identical everywhere.
    """
    import jax
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    # a global (non-fully-addressable) jax.Array: tiled=True reshards it to
    # fully-replicated and returns the global value on every process
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
