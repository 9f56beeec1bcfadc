"""Pallas TPU kernels for the NTT butterfly stage — the hot op of the prover.

One radix-2 stage over n points is a map over n/2 butterflies:

    (lo, hi) -> (lo + w*hi, lo - w*hi)      in GF(p), Montgomery form

As plain jnp the Montgomery multiply lowers to ~40 unfused elementwise HBM
round-trips per stage; this kernel keeps the whole butterfly (SOS Montgomery
multiply + modular add/sub across all limbs) in VMEM, so each stage costs
ONE read and ONE write of the data (plus the twiddle read): measured ~10x
over the jnp formulation at n = 2^21 on v5e.

Layout: x is uint32[L, n] (16-bit limbs along the leading axis).  The stage
with half-size m pairs element i with i+m inside each 2m group.  Blocks are
[L, 2*BLK] contiguous runs; the kernel deinterleaves lo/hi in-register with
a static reshape when m < 2*BLK, or by block index arithmetic when the lo
and hi runs are block-aligned.  Twiddles arrive pre-broadcast as
uint32[L, n/2] so their block is always the contiguous [L, BLK] run.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field.limbs import LIMB_BITS, LIMB_MASK

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


def _mont_mul_limbs(a: List[jnp.ndarray], b: List[jnp.ndarray],
                    p_limbs: np.ndarray, n0p: np.uint32) -> List[jnp.ndarray]:
    """SOS Montgomery multiply on lists of [..] uint32 limb arrays (values in
    16-bit limbs).  Pure elementwise ops — everything stays in registers/VMEM
    inside a Pallas kernel."""
    L = len(a)
    acc = [None] * (2 * L + 1)

    def add_at(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(L):
        for k in range(L):
            prod = a[i] * b[k]
            add_at(i + k, prod & _MASK)
            add_at(i + k + 1, prod >> LIMB_BITS)
    for k in range(2 * L + 1):
        if acc[k] is None:
            acc[k] = jnp.zeros_like(a[0])

    c = jnp.zeros_like(a[0])
    for i in range(L):
        x = acc[i] + c
        mfac = ((x & _MASK) * n0p) & _MASK
        mp = [mfac * np.uint32(p_limbs[k]) for k in range(L)]
        c = (x + (mp[0] & _MASK)) >> np.uint32(LIMB_BITS)
        for k in range(1, L):
            acc[i + k] = acc[i + k] + (mp[k] & _MASK)
        for k in range(L):
            acc[i + k + 1] = acc[i + k + 1] + (mp[k] >> np.uint32(LIMB_BITS))
    # final carry resolution over result limbs L..2L-1 (value < 2p)
    t = []
    for k in range(L):
        s = acc[L + k] + c
        t.append(s & _MASK)
        c = s >> np.uint32(LIMB_BITS)
    return _cond_sub_p(t, c, p_limbs)


def _cond_sub_p(limbs: List[jnp.ndarray], carry: jnp.ndarray,
                p_limbs: np.ndarray) -> List[jnp.ndarray]:
    L = len(limbs)
    diff = []
    borrow = jnp.zeros_like(limbs[0])
    for j in range(L):
        s = limbs[j] - np.uint32(p_limbs[j]) - borrow
        diff.append(s & _MASK)
        borrow = (s >> np.uint32(31)) & np.uint32(1)
    take = (carry | (np.uint32(1) - borrow)).astype(jnp.bool_)
    return [jnp.where(take, diff[j], limbs[j]) for j in range(L)]


def _add_mod(a, b, p_limbs):
    L = len(a)
    t = []
    c = jnp.zeros_like(a[0])
    for j in range(L):
        s = a[j] + b[j] + c
        t.append(s & _MASK)
        c = s >> np.uint32(LIMB_BITS)
    return _cond_sub_p(t, c, p_limbs)


def _sub_mod(a, b, p_limbs):
    L = len(a)
    t = []
    borrow = jnp.zeros_like(a[0])
    for j in range(L):
        s = a[j] - b[j] - borrow
        t.append(s & _MASK)
        borrow = (s >> np.uint32(31)) & np.uint32(1)
    add_p = borrow.astype(jnp.bool_)
    t2 = []
    c = jnp.zeros_like(a[0])
    for j in range(L):
        s = t[j] + np.uint32(p_limbs[j]) + c
        t2.append(s & _MASK)
        c = s >> np.uint32(LIMB_BITS)
    return [jnp.where(add_p, t2[j], t[j]) for j in range(L)]


_SMALL_M = 256    # below this, lane-crossing reshapes break Mosaic: use rolls


def _make_stage(L: int, p_limbs_bytes: bytes, n0p_int: int, n: int, B: int,
                m: int, blk: int, interpret: bool):
    """Butterfly-stage pallas_call for one (field, n, B, m).  blk =
    butterflies per program instance; each program handles one contiguous
    [L, 1, 2*blk] run (always whole 2m-groups since m | blk).

    Two in-kernel strategies:
    - m >= _SMALL_M: deinterleave lo/hi with a lane-aligned reshape
      (sub-lane-crossing reshapes fail to compile in Mosaic below ~256).
    - m < _SMALL_M: keep the data interleaved and pair via lane rolls:
      t = x*w everywhere, out = is_hi ? roll(x,+m) - t : x + roll(t,-m).
      Costs ~2x the arithmetic of the aligned path but stays in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_limbs = np.frombuffer(p_limbs_bytes, dtype=np.uint32)
    n0p = np.uint32(n0p_int)
    half = n // 2
    small = m < _SMALL_M

    def kernel(x_ref, tw_ref, out_ref):
        xb = x_ref[...]                                  # [L, 2*blk]
        if not small:
            twb = tw_ref[...]                            # [L, blk]
            y = xb.reshape(L, (2 * blk) // (2 * m), 2, m)
            lo = y[:, :, 0, :].reshape(L, blk)
            hi = y[:, :, 1, :].reshape(L, blk)
            t = _mont_mul_limbs([hi[i] for i in range(L)],
                                [twb[i] for i in range(L)], p_limbs, n0p)
            lo_l = [lo[i] for i in range(L)]
            new_lo = _add_mod(lo_l, t, p_limbs)
            new_hi = _sub_mod(lo_l, t, p_limbs)
            y = jnp.stack([jnp.stack(new_lo).reshape(L, -1, m),
                           jnp.stack(new_hi).reshape(L, -1, m)], axis=2)
            out_ref[...] = y.reshape(L, 2 * blk)
            return
        twb = tw_ref[...]                                # interleaved twiddles
        t = _mont_mul_limbs([xb[i] for i in range(L)],
                            [twb[i] for i in range(L)], p_limbs, n0p)
        t_arr = jnp.stack(t)                             # [L, 2*blk]
        sl_t = pltpu.roll(t_arr, shift=2 * blk - m, axis=1)   # t[q+m] at q
        sr_x = pltpu.roll(xb, shift=m, axis=1)           # x[q-m] at q
        xs = [xb[i] for i in range(L)]
        add_res = _add_mod(xs, [sl_t[i] for i in range(L)], p_limbs)
        sub_res = _sub_mod([sr_x[i] for i in range(L)], t, p_limbs)
        lane = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * blk), 1)
        is_hi = ((lane >> int(m.bit_length() - 1)) & 1) == 1
        out = jnp.where(is_hi, jnp.stack(sub_res), jnp.stack(add_res))
        out_ref[...] = out

    grid = (B, half // blk)
    tw_cols = 2 * blk if small else blk

    def run(x2, twf):
        # x2: [B*L, n] (batch-major limb stacking — 2D blocks keep Mosaic's
        # (8, 128)-divisibility rules trivially satisfiable)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * L, n), jnp.uint32),
            grid=grid,
            in_specs=[pl.BlockSpec((L, 2 * blk), lambda b, i: (b, i)),
                      pl.BlockSpec((L, tw_cols), lambda b, i: (0, i))],
            out_specs=pl.BlockSpec((L, 2 * blk), lambda b, i: (b, i)),
            interpret=interpret,
        )(x2, twf)

    return run


@functools.lru_cache(maxsize=None)
def _stage_fn(L, p_limbs_bytes, n0p_int, n, B, m, blk, interpret):
    return jax.jit(_make_stage(L, p_limbs_bytes, n0p_int, n, B, m, blk,
                               interpret))


_BLK = 4096      # butterflies per program (single-stage kernels)
# butterflies per program in the multi-stage kernel: Mosaic allocates kernel
# stack without reusing across the sequential stages (~3.5 block-sizes per
# stage), so the block must stay small enough that ~12 stages of
# temporaries fit the 16MB VMEM
_MBLK = 2048


def _make_multistage(L: int, p_limbs_bytes: bytes, n0p_int: int, n: int,
                     B: int, blk: int, interpret: bool):
    """ALL stages with m <= blk in ONE kernel: the [L, 2*blk] block stays in
    VMEM across the whole stage sequence (one HBM read + one write for
    log2(2*blk) stages, and one Mosaic compile instead of one per stage —
    per-program compile round-trips dominate warmup on this backend).

    Twiddles arrive as lane-concatenated per-stage panels: stage m uses a
    period-(2m) interleaved panel for the roll path (m < _SMALL_M) or a
    period-m butterfly-order panel for the aligned path, tiled to block
    width in-kernel (lane concat — no shuffles)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_limbs = np.frombuffer(p_limbs_bytes, dtype=np.uint32)
    n0p = np.uint32(n0p_int)
    half = n // 2
    stage_ms = []
    m = 1
    while m < n and m <= blk:
        stage_ms.append(m)
        m *= 2
    # panel layout: per stage, [L, 2m] (roll) or [L, m] (aligned)
    panel_cols = [2 * m if m < _SMALL_M else m for m in stage_ms]
    panel_offs = np.cumsum([0] + panel_cols)

    def kernel(x_ref, tw_ref, out_ref):
        x = x_ref[...]                                   # [L, 2*blk]
        for si, m in enumerate(stage_ms):
            off, cols = int(panel_offs[si]), panel_cols[si]
            panel = tw_ref[:, off:off + cols]
            if m < _SMALL_M:
                twe = jnp.tile(panel, (1, (2 * blk) // (2 * m)))
                t = _mont_mul_limbs([x[i] for i in range(L)],
                                    [twe[i] for i in range(L)], p_limbs, n0p)
                t_arr = jnp.stack(t)
                sl_t = pltpu.roll(t_arr, shift=2 * blk - m, axis=1)
                sr_x = pltpu.roll(x, shift=m, axis=1)
                xs = [x[i] for i in range(L)]
                add_res = _add_mod(xs, [sl_t[i] for i in range(L)], p_limbs)
                sub_res = _sub_mod([sr_x[i] for i in range(L)], t, p_limbs)
                lane = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * blk), 1)
                is_hi = ((lane >> int(m.bit_length() - 1)) & 1) == 1
                x = jnp.where(is_hi, jnp.stack(sub_res), jnp.stack(add_res))
            else:
                y = x.reshape(L, (2 * blk) // (2 * m), 2, m)
                lo = y[:, :, 0, :].reshape(L, blk)
                hi = y[:, :, 1, :].reshape(L, blk)
                twf = jnp.tile(panel, (1, blk // m))
                t = _mont_mul_limbs([hi[i] for i in range(L)],
                                    [twf[i] for i in range(L)], p_limbs, n0p)
                lo_l = [lo[i] for i in range(L)]
                new_lo = _add_mod(lo_l, t, p_limbs)
                new_hi = _sub_mod(lo_l, t, p_limbs)
                x = jnp.stack([jnp.stack(new_lo).reshape(L, -1, m),
                               jnp.stack(new_hi).reshape(L, -1, m)],
                              axis=2).reshape(L, 2 * blk)
        out_ref[...] = x

    total_cols = int(panel_offs[-1])

    def run(x2, tw_panels):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * L, n), jnp.uint32),
            grid=(B, half // blk),
            in_specs=[pl.BlockSpec((L, 2 * blk), lambda b, i: (b, i)),
                      pl.BlockSpec((L, total_cols), lambda b, i: (0, 0))],
            out_specs=pl.BlockSpec((L, 2 * blk), lambda b, i: (b, i)),
            interpret=interpret,
        )(x2, tw_panels)

    return run, stage_ms, panel_cols


@functools.lru_cache(maxsize=None)
def _multistage_fn(L, p_limbs_bytes, n0p_int, n, B, blk, interpret):
    run, stage_ms, panel_cols = _make_multistage(
        L, p_limbs_bytes, n0p_int, n, B, blk, interpret)
    return jax.jit(run), stage_ms, panel_cols


def multistage(field, x2: jnp.ndarray, w_table: jnp.ndarray, L: int, n: int,
               interpret: bool = False):
    """Run all stages with m <= blk in one kernel.  x2: [B*L, n] batch-major
    limb rows; w_table: [L, n/2].  Returns (x2', last_m_done)."""
    B = x2.shape[0] // L
    half = n // 2
    blk = min(half, _MBLK)
    fn, stage_ms, panel_cols = _multistage_fn(
        L, field.device._p_np.tobytes(), int(field.device._n0p), n, B, blk,
        interpret)
    panels = []
    for m in stage_ms:
        stride = half // m
        tw = w_table.reshape(L, m, stride)[:, :, 0]      # [L, m]
        if m < _SMALL_M:
            panels.append(jnp.concatenate([tw, tw], axis=1))   # period 2m
        else:
            panels.append(tw)
    tw_panels = jnp.concatenate(panels, axis=1)
    return fn(x2, tw_panels), stage_ms[-1]


def _make_stage_split(L: int, p_limbs_bytes: bytes, n0p_int: int, n: int,
                      B: int, m: int, blk: int, interpret: bool):
    """Large-m variant (m >= 2*blk would make whole-group blocks exceed
    VMEM): the lo and hi runs are fetched as two block-aligned views of x
    (m is a multiple of blk) and written to two half-size outputs that the
    caller re-interleaves with one cheap XLA pass."""
    from jax.experimental import pallas as pl

    p_limbs = np.frombuffer(p_limbs_bytes, dtype=np.uint32)
    n0p = np.uint32(n0p_int)
    half = n // 2
    mb = m // blk

    def kernel(lo_ref, hi_ref, tw_ref, lo_out, hi_out):
        lo = lo_ref[...]                                 # [L, blk]
        hi = hi_ref[...]
        twb = tw_ref[...]
        t = _mont_mul_limbs([hi[i] for i in range(L)],
                            [twb[i] for i in range(L)], p_limbs, n0p)
        lo_l = [lo[i] for i in range(L)]
        lo_out[...] = jnp.stack(_add_mod(lo_l, t, p_limbs))
        hi_out[...] = jnp.stack(_sub_mod(lo_l, t, p_limbs))

    def lo_index(b, i):
        # butterfly block i starts at butterfly i*blk: group g = i*blk // m,
        # j = i*blk % m; lo element start = g*2m + j (block-aligned)
        g, jb = i // mb, i % mb
        return (b, g * 2 * mb + jb)

    def hi_index(b, i):
        g, jb = i // mb, i % mb
        return (b, g * 2 * mb + mb + jb)

    def run(x2, twf):
        lo_out, hi_out = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((B * L, half), jnp.uint32),
                       jax.ShapeDtypeStruct((B * L, half), jnp.uint32)),
            grid=(B, half // blk),
            in_specs=[pl.BlockSpec((L, blk), lo_index),
                      pl.BlockSpec((L, blk), hi_index),
                      pl.BlockSpec((L, blk), lambda b, i: (0, i))],
            out_specs=(pl.BlockSpec((L, blk), lambda b, i: (b, i)),
                       pl.BlockSpec((L, blk), lambda b, i: (b, i))),
            interpret=interpret,
        )(x2, x2, twf)
        g = half // m
        y = jnp.stack([lo_out.reshape(B * L, g, m),
                       hi_out.reshape(B * L, g, m)], axis=-2)
        return y.reshape(B * L, n)

    return run


@functools.lru_cache(maxsize=None)
def _stage_fn_split(L, p_limbs_bytes, n0p_int, n, B, m, blk, interpret):
    return jax.jit(_make_stage_split(L, p_limbs_bytes, n0p_int, n, B, m, blk,
                                     interpret))


def butterfly_stage2(field, x2: jnp.ndarray, twf: jnp.ndarray, L: int,
                     n: int, m: int, interpret: bool = False) -> jnp.ndarray:
    """One radix-2 stage on batch-major limb rows x2: uint32[B*L, n] (row
    b*L+i is limb i of batch element b — the layout ntt_core_table keeps for
    the whole transform).  twf: for m >= _SMALL_M the [L, n/2] twiddles in
    butterfly order (tw for butterfly i at column i); for m < _SMALL_M the
    [L, n] INTERLEAVED twiddles (broadcast over both lo and hi slots)."""
    B = x2.shape[0] // L
    half = n // 2
    args = (L, field.device._p_np.tobytes(), int(field.device._n0p), n, B, m)
    if m > _BLK:
        fn = _stage_fn_split(*args, _BLK, interpret)
    else:
        fn = _stage_fn(*args, min(half, max(m, _BLK)), interpret)
    return fn(x2, twf)


def butterfly_stage(field, x: jnp.ndarray, twf: jnp.ndarray, n: int, m: int,
                    interpret: bool = False) -> jnp.ndarray:
    """[L, B, n] wrapper over butterfly_stage2 (used by tests)."""
    L, B, _ = x.shape
    x2 = jnp.swapaxes(x, 0, 1).reshape(B * L, n)
    out = butterfly_stage2(field, x2, twf, L, n, m, interpret)
    return jnp.swapaxes(out.reshape(B, L, n), 0, 1)
