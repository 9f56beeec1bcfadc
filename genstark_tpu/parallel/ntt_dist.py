"""Distributed 4-step (Bailey) NTT over a 1-D device mesh.

This is the sharded form of the north-star kernel (BASELINE.json): trace/LDE
coefficients partitioned over chips, butterfly stages exchanged via a single
all-to-all over ICI.

Decomposition: N = n1 * n2, input viewed as A[i1, i2] (row-major).
  1. local n1-point NTTs along i1 (columns i2 sharded across devices),
  2. twiddle multiply by w^(k1 * i2)  (computed shard-locally),
  3. all-to-all reshard: split k1, gather i2,
  4. local n2-point NTTs along i2.
Output block D[k1, k2] holds X[k1 + n1*k2]; `natural_output=True` performs the
final global transpose so D equals the canonical `ntt.ntt` result (tests use
this; a fused pipeline would keep the transposed layout and fold the
permutation into downstream indexing).

The canonical size-m roots used by the local plans are exactly w^(N/m) for
the deterministic two-adic generator, so local stages compose correctly.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import ntt as ntt_mod
from ..field import PrimeField


def _vector_power_series(dev, base: jnp.ndarray, length: int) -> jnp.ndarray:
    """Powers 0..length-1 of a vector of bases: [L, B] -> [L, length, B]."""
    one = jnp.broadcast_to(dev.one((1, 1)), (dev.L, 1, base.shape[-1]))
    # tie the constant's varying-manual-axes type to `base` so concatenation
    # with base-derived values is well typed under shard_map (same pattern
    # as hash/blake2s._compress; the mask folds away in XLA)
    one = one ^ (base[:, None, :] & jnp.uint32(0))
    out = one                                    # powers 0..cur-1
    power = base[:, None, :]                     # base^cur
    cur = 1
    while cur < length:
        nxt = dev.mont_mul(out, power)           # powers cur..2cur-1
        out = jnp.concatenate([out, nxt], axis=1)
        power = dev.mont_mul(power, power)
        cur *= 2
    return out[:, :length]


@lru_cache(maxsize=None)
def _dist_ntt_fn(field: PrimeField, n: int, n_devices: int, inverse: bool,
                 natural_output: bool, mesh_id: int):
    """Build the jitted shard_map 4-step transform (cached)."""
    from jax import shard_map

    mesh = _MESHES[mesh_id]
    dev = field.device
    f = field.host
    axis = mesh.axis_names[0]
    D = n_devices
    # pick n2 as the sharded input axis: n2 must be divisible by D, n1 by D
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    if n1 < D or n2 < D:
        raise ValueError(f"domain {n} too small for {D} devices")

    w = f.get_root_of_unity(n)
    if inverse:
        w = f.inv(w)
    # per-column twiddle bases w^(i2): a power series over the full n2 axis,
    # sharded the same way as the data (each device gets its own i2 slice)
    base_full = dev.power_series(w, n2)                     # [L, n2]
    n_inv = f.inv(n % field.modulus) if inverse else None
    # materialize local plans eagerly — building them lazily inside the traced
    # body would cache tracers in the plan cache (leak)
    plans = {n1: ntt_mod.get_plan(field, n1, inverse),
             n2: ntt_mod.get_plan(field, n2, inverse)}

    def local_ntt(block, size):
        # block: [L, B1, size] -> ntt along last axis
        moved = jnp.moveaxis(block, 0, 1)                   # [B1, L, size]
        out = ntt_mod._ntt_core(field, moved, plans[size])
        return jnp.moveaxis(out, 1, 0)

    def body(a_block, base_block):
        # a_block: [L, n1, n2/D]; base_block: [L, n2/D]
        blk = jnp.moveaxis(a_block, 2, 1)                   # [L, n2/D, n1]
        blk = local_ntt(blk, n1)                            # NTT over i1
        blk = jnp.moveaxis(blk, 1, 2)                       # [L, n1, n2/D]
        # twiddle: w^(k1 * i2) = (w^(i2))^(k1)
        tw = _vector_power_series(dev, base_block, n1)      # [L, n1, n2/D]
        blk = dev.mont_mul(blk, tw)
        # reshard: split k1 across devices, gather full i2
        blk = jax.lax.all_to_all(blk, axis, split_axis=1, concat_axis=2,
                                 tiled=True)                # [L, n1/D, n2]
        blk = local_ntt(blk, n2)                            # NTT over i2
        if inverse:
            blk = dev.mont_mul(blk, dev.const(n_inv, shape=(1, 1)))
        return blk

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=P(None, axis, None),
        # pallas_call inside the body (butterfly/hash kernels on real TPUs)
        # carries no varying-mesh-axes annotation; the explicit specs are
        # the ground truth, so skip the vma checker
        check_vma=False)

    def run(values):
        a = values.reshape(dev.L, n1, n2)
        out = sharded(a, base_full)                         # [L, n1, n2] block D
        if natural_output:
            out = jnp.swapaxes(out, 1, 2).reshape(dev.L, n)
        return out

    return jax.jit(run)


def can_distribute(n: int, n_devices: int) -> bool:
    """True when the 4-step split of an n-point transform fits the mesh
    (both sub-transform axes must be >= the device count so the all-to-all
    resharding is well formed)."""
    if n < 4:
        return False
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    return n1 >= n_devices and n2 >= n_devices


def dist_ntt_core(field: PrimeField, a: jnp.ndarray, n: int,
                  w_table: jnp.ndarray, mesh: Mesh,
                  mxu_local=None) -> jnp.ndarray:
    """Traceable 4-step NTT over `mesh` — natural order in and out.

    a: [..., L, n] Montgomery-form values; w_table: [L, n/2] half-table of
    the transform root's powers (MAY be a traced argument — the fused prover
    passes its packed power tables as program parameters so nothing is baked
    into executables as a literal; inverse transforms pass the inverse-root
    table and scale by n^-1 themselves).

    This is the composable form of `_dist_ntt_fn` for use INSIDE an outer
    jit (the mesh-sharded fused prover): local n1-point NTTs, shard-local
    twiddle by w^(k1*i2), one all-to-all reshard over ICI, local n2-point
    NTTs.  All local twiddle tables are derived from `w_table` by
    reshape-picks (w^(n/m) powers are every (n/m)-th entry), so no extra
    tables are materialized.

    mxu_local: optional (bundle_n1, bundle_n2) pair of MXU multi-level
    table bundles (ntt.MxuPlan.bundle(), scale=1, roots w^n2 / w^n1) — the
    shard-local transforms then run as digit-matmul DFT levels on the MXU
    instead of VPU butterflies.  Bit-identical either way, so proof bytes
    do not depend on the choice.
    """
    from jax import shard_map

    dev = field.device
    L = dev.L
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    if n1 < D or n2 < D:
        raise ValueError(f"domain {n} too small for {D} devices")

    # local half-tables from the full half-table: the size-m canonical root
    # is w^(n/m), whose powers are every (n/m)-th entry of w_table
    w1t = w_table.reshape(L, n1 // 2, n2)[:, :, 0]          # root w^n2, size n1
    w2t = w_table.reshape(L, n2 // 2, n1)[:, :, 0]          # root w^n1, size n2
    base = jax.lax.slice(w_table, (0, 0), (L, n2))          # w^(i2), i2 < n2

    mxu_leaves, mxu_tree = jax.tree.flatten(mxu_local)

    def body(blk, base_blk, w1, w2, *mxu_args):
        # blk: [L, B, n1, n2/D]; base_blk: [L, n2/D]; w1/w2 replicated tables
        b1 = b2 = None
        if mxu_args:
            b1, b2 = jax.tree.unflatten(mxu_tree, mxu_args)

        def local(x, m, w, bundle):                         # x: [..., L, m]
            if bundle is not None:
                return ntt_mod.mxu_transform_core(field, x, m, bundle)
            return ntt_mod.ntt_core_table(field, x, m, w)

        x = jnp.transpose(blk, (1, 3, 0, 2))                # [B, n2/D, L, n1]
        x = local(x, n1, w1, b1)
        blk = jnp.transpose(x, (2, 0, 3, 1))                # [L, B, n1, n2/D]
        tw = _vector_power_series(dev, base_blk, n1)        # [L, n1, n2/D]
        blk = dev.mont_mul(blk, tw[:, None])
        blk = jax.lax.all_to_all(blk, axis, split_axis=2, concat_axis=3,
                                 tiled=True)                # [L, B, n1/D, n2]
        x = jnp.transpose(blk, (1, 2, 0, 3))                # [B, n1/D, L, n2]
        x = local(x, n2, w2, b2)
        return jnp.transpose(x, (2, 0, 1, 3))               # [L, B, n1/D, n2]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, axis),
                  P(None, None), P(None, None)) + (P(),) * len(mxu_leaves),
        out_specs=P(None, None, axis, None),
        check_vma=False)   # see above: pallas bodies lack vma annotations

    batch_shape = a.shape[:-2]
    x = a.reshape((-1, L, n)) if batch_shape else a[None]
    x = jnp.swapaxes(x, 0, 1).reshape(L, -1, n1, n2)        # [L, B, n1, n2]
    out = sharded(x, base, w1t, w2t, *mxu_leaves)           # D[k1, k2]
    # natural order: X[k1 + n1*k2] -> transpose (k2, k1) then flatten
    nat = jnp.transpose(out, (1, 0, 3, 2)).reshape(-1, L, n)  # [B, L, n]
    return nat.reshape(batch_shape + (L, n)) if batch_shape else nat[0]


_MESHES = {}


def _register_mesh(mesh: Mesh) -> int:
    mid = id(mesh)
    _MESHES[mid] = mesh
    return mid


def distributed_ntt(field: PrimeField, values: jnp.ndarray, mesh: Mesh,
                    natural_output: bool = True) -> jnp.ndarray:
    """Forward NTT of [L, N] over the mesh's devices."""
    n = values.shape[-1]
    fn = _dist_ntt_fn(field, n, mesh.devices.size, False, natural_output,
                      _register_mesh(mesh))
    return fn(values)


def distributed_intt(field: PrimeField, values: jnp.ndarray, mesh: Mesh,
                     natural_output: bool = True) -> jnp.ndarray:
    """Inverse NTT of [L, N] over the mesh's devices."""
    n = values.shape[-1]
    fn = _dist_ntt_fn(field, n, mesh.devices.size, True, natural_output,
                      _register_mesh(mesh))
    return fn(values)
