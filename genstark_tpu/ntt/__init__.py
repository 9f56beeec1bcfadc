"""NTT / iNTT over multiplicative subgroups — the north-star kernel layer.

Replaces galois's WASM `interpolateRoots` / `evalPolysAtRoots` /
`evalPolyAtRoots` (used at /root/reference/lib/Stark.ts:106-109 and
/root/reference/lib/components/CompositionPolynomial.ts:109-110).

Design: iterative radix-2 Cooley-Tukey (decimation in time) over the limb
representation, with ALL stage indexing computed inside a `lax.fori_loop`
from the stage counter (pure bit arithmetic on an iota) — no per-stage
reshapes and no uploaded index tables.  One tiny compiled program per
(field, size, direction): on the tunnelled-TPU backend the dominant
one-time cost is per-program executable size (compile + transfer), and the
steady-state cost is per-dispatch round-trips, so a whole transform must be
a single small program.

The only materialized table is the twiddle half-table [L, n/2] (computed on
device by a log-doubling power series — never uploaded).  Butterflies are
expressed as three gathers along the lane axis (lo/hi pick, inverse-shuffle
write-back), which keeps every stage shape-invariant at [L, B, n].

A batched variant transforms R polynomials at once ([R, L, N]) by folding the
register axis into the batch, which is how trace matrices are interpolated /
extended in one shot.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field import PrimeField


class NttPlan:
    """Cached twiddle table for one (field, size, direction)."""

    def __init__(self, field: PrimeField, n: int, inverse: bool):
        self.field = field
        self.n = n
        self.inverse = inverse
        w = field.get_root_of_unity(n)
        if inverse:
            w = field.inv(w)
        self.w = w
        # full half-table of twiddles [L, n/2] in Montgomery form (device)
        if n >= 2:
            self.w_table = field.device.power_series(w, n // 2)
        else:
            self.w_table = field.device.power_series(1, 1)
        if inverse:
            self.n_inv = field.inv(n % field.modulus)
        # MXU multi-level tables (128-bit field on TPU): the whole transform
        # runs as digit-matmul DFT levels, so neither the butterfly kernels
        # nor the 4-step panel are needed; the iNTT's n^-1 scale folds into
        # the level-1 digit matrix (no separate scaling pass)
        self.mxu = None
        if mxu_applicable(field, n):
            scale = self.n_inv if inverse else 1
            self.mxu = get_mxu_plan(field, n, w, scale).bundle()
        # 4-step twiddle panel, built once per plan (one gather) so the
        # standalone transform path does not rebuild it on every call
        self.panel = None
        if self.mxu is None and _use_pallas() and _four_step_local(n):
            n1 = 1 << ((n.bit_length() - 1) // 2)
            dev = field.device
            full = jnp.concatenate([self.w_table, dev.neg(self.w_table)],
                                   axis=1)
            idx = (jax.lax.iota(jnp.int32, n1)[:, None] *
                   jax.lax.iota(jnp.int32, n // n1)[None, :])
            self.panel = jnp.take(full, idx.reshape(-1), axis=1)


@lru_cache(maxsize=None)
def get_plan(field: PrimeField, n: int, inverse: bool) -> NttPlan:
    return NttPlan(field, n, inverse)


@lru_cache(maxsize=None)
def _jitted_transform(field: PrimeField, n: int, inverse: bool):
    """Whole-transform jit (cached per field/size/direction); jax re-traces
    per batch shape automatically.  The twiddle table and 4-step panel are
    passed as ARGUMENTS (not closed over) so they are program parameters,
    never multi-MB constants baked into the executable."""
    plan = get_plan(field, n, inverse)

    def run(a, w_table, panel, mxu_tabs):
        if mxu_tabs is not None:
            # n^-1 for the inverse transform is folded into the plan's
            # level-1 digit matrix — no separate scaling pass
            return mxu_transform_core(field, a, n, mxu_tabs)
        elif panel is not None:
            out = _four_step_core(field, a, n, w_table, panel=panel)
        else:
            out = ntt_core_table(field, a, n, w_table)
        if inverse:
            dev = field.device
            n_inv = dev.const(plan.n_inv, shape=(1,))
            if out.ndim == 2:
                return dev.mont_mul(out, n_inv)
            moved = jnp.moveaxis(out, -2, 0)
            scaled = dev.mont_mul(moved, n_inv)
            return jnp.moveaxis(scaled, 0, -2)
        return out

    jitted = jax.jit(run)
    return lambda a: jitted(a, plan.w_table, plan.panel, plan.mxu)


@lru_cache(maxsize=None)
def _use_loop_stages() -> bool:
    """On the CPU backend run the butterfly stages as a lax.fori_loop with
    gather-derived pairing instead of the unrolled per-stage graph: the
    unrolled form is what XLA:CPU compiles slowest (minutes per prover
    program — it is ~log2(n) x ~50 vector ops of deep u32 chains), and CPU
    runs are the correctness suite, where per-proof runtime at toy sizes is
    irrelevant.  The math (and therefore every proof byte) is identical.
    On TPU the gathers defeat lane vectorization (~100x slower at runtime),
    so this path never runs there.  GENSTARK_CPU_LOOP_NTT=0 disables."""
    import os
    v = os.environ.get("GENSTARK_CPU_LOOP_NTT")
    if v is not None:
        return v != "0"
    return jax.default_backend() == "cpu"


def _loop_stage_core(field: PrimeField, x: jnp.ndarray, n: int,
                     w_table: jnp.ndarray) -> jnp.ndarray:
    """All butterfly stages as one fori_loop.  x: [L, B, n] bit-reversed
    input; returns [L, B, n] natural-order transform."""
    dev = field.device
    S = n.bit_length() - 1
    half = n // 2
    iota = jax.lax.iota(jnp.int32, n)

    def body(s, x):
        m = jnp.int32(1) << s
        is_hi = (iota & m) != 0                        # [n]
        xl = jnp.take(x, iota & ~m, axis=-1)           # lo of the pair
        xh = jnp.take(x, iota | m, axis=-1)            # hi of the pair
        tw_idx = (iota & (m - 1)) << (jnp.int32(S - 1) - s)
        w = jnp.take(w_table, tw_idx, axis=-1)         # [L, n]
        t = dev.mont_mul(xh, w[:, None, :])
        return jnp.where(is_hi, dev._sub(xl, t), dev._add(xl, t))

    return jax.lax.fori_loop(0, S, body, x)


@lru_cache(maxsize=None)
def _use_pallas() -> bool:
    """Pallas butterfly kernels on real TPUs; pure-jnp elsewhere (CPU tests
    run the same math without Mosaic).  GENSTARK_NO_PALLAS=1 disables."""
    import os
    if os.environ.get("GENSTARK_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


# ------------------------------------------------------ MXU multi-level NTT
@lru_cache(maxsize=None)
def _use_mxu() -> bool:
    """MXU (int8-matmul) DFT locals for the solinas-foldable fields — p128
    and p32 (ntt/mxu.py).  GENSTARK_MXU=0 disables, =1 forces (the XLA
    reference path runs the identical math on CPU); default: on wherever
    the Pallas kernels are."""
    import os
    v = os.environ.get("GENSTARK_MXU")
    if v is not None:
        return v != "0"
    return _use_pallas()


@lru_cache(maxsize=None)
def _mxu_min_n() -> int:
    import os
    try:
        return int(os.environ.get("GENSTARK_MXU_MIN", 1 << 13))
    except ValueError:
        return 1 << 13


# Measured v5e full-path level rates (T int8-MACs/s, digit-native kernel +
# inter-level transpose included) by level size m (scripts/mxu_level_bench,
# round 5: digit-emitting epilogue, 3-fold reduction); sub-64 values
# extrapolate the small-m falloff.  OVH is the measured per-point per-level
# fixed data-movement cost outside the kernel (the int8 transpose,
# ~0.05 ms per 2^20 points).
_MXU_RATE = {2: 0.8, 4: 1.6, 8: 3.0, 16: 5.0, 32: 9.0, 64: 24.9,
             128: 48.3, 256: 79.1, 512: 110.8, 1024: 125.0, 2048: 130.0}
_MXU_LEVEL_OVH = 0.055e-9
_MXU_MAX_M = 2048            # s32-accumulator bound (ntt/mxu.py MAX_M)


@lru_cache(maxsize=None)
def _mxu_level_bits():
    """Optional GENSTARK_MXU_BITS override: force level count
    ceil(bits/this) instead of the cost-model choice (tuning knob)."""
    import os
    v = os.environ.get("GENSTARK_MXU_BITS")
    if not v:
        return None
    try:
        return int(v)
    except ValueError:
        return None


def _equal_split(bits: int, q: int):
    base, extra = divmod(bits, q)
    return [1 << (base + (1 if i < extra else 0)) for i in range(q)]


@lru_cache(maxsize=None)
def mxu_levels(n: int, element_size: int = 16):
    """Level sizes for the multi-level MXU decomposition of an n-point
    transform — EVERY level is a digit-matmul DFT on the MXU (the kernel
    accepts any power-of-two m: whole-array blocks are legal below the
    128-lane tile), so no VPU residual transform exists.

    The bit count splits into q near-equal levels with q chosen by a
    measured cost model: per point, a level of size m costs
    m * D^2 / rate(m) of MAC time (D = element_size + 1 signed base-256
    digits — 17 for p128, 5 for p32) plus a fixed overhead (digit encode,
    int8 transpose, epilogue).  Fewer, larger levels spend more MACs but
    fewer passes.  None when n is too small."""
    bits = n.bit_length() - 1
    if bits < 7:                 # < 128 points: not worth a digit matmul
        return None
    lb = _mxu_level_bits()
    if lb is not None:
        return _equal_split(bits, max(1, -(-bits // lb)))
    d2 = (element_size + 1) ** 2
    best, best_cost = None, None
    for q in range(1, bits + 1):
        levels = _equal_split(bits, q)
        if levels[0] > _MXU_MAX_M:
            continue
        cost = q * _MXU_LEVEL_OVH + sum(
            m * d2 / (_MXU_RATE[m] * 1e12) for m in levels)
        if best_cost is None or cost < best_cost:
            best, best_cost = levels, cost
    return best


def mxu_applicable(field: PrimeField, n: int) -> bool:
    from .mxu import solinas_spec
    return (_use_mxu() and solinas_spec(field.modulus) is not None
            and n >= _mxu_min_n()
            and mxu_levels(n, field.element_size) is not None)


def mxu_table_specs(field: PrimeField, n: int, root: int, scale: int = 1):
    """Host-side table recipe for one MXU multi-level transform:
    (w8_roots per level, twiddle specs per level) where a twiddle spec is
    None (rest == 1), ("d", w_l, rest, tc) for a direct period-`rest`
    panel, or ("f", A_seed, rest//s, B_seed, s) for the factored pair.

    Each level's digit matrix uses the canonical m-root relative to `root`;
    `scale` (e.g. the iNTT's n^-1) is folded into LEVEL 1's digit matrix —
    every output passes through level 1 exactly once and the rest is
    linear, so a single scaled matrix scales the whole transform.  The
    factored twiddle A[k, h] = w_l^(k*h*s), B[k, t] = w_l^(k*t) is
    O(sqrt(rest)) entries instead of the O(n) panel."""
    from .mxu import level_tc, twiddle_split
    levels = mxu_levels(n, field.element_size)
    p = field.modulus
    root %= p
    w8_roots = []
    ab = []
    n_l = n
    for m in levels:
        rest = n_l // m
        w_l = pow(root, n // n_l, p)        # canonical n_l-root wrt `root`
        w8_roots.append(pow(w_l, rest, p))  # canonical m-root
        if rest > 1:
            tc = level_tc(m)
            s = twiddle_split(rest, tc)
            if s == 0:                      # direct period-`rest` panel
                ab.append(("d", w_l, rest, tc))
            else:
                ab.append(("f", pow(w_l, s, p), rest // s, w_l, s))
        else:
            ab.append(None)
        n_l = rest
    return w8_roots, ab


class MxuPlan:
    """Device tables for one (field, n, root, scale): per-level W-digit
    matrices (int8; level 1 carries the scale), factored twiddle pairs and
    the residual half-table (Montgomery)."""

    def __init__(self, field: PrimeField, n: int, root: int, scale: int = 1):
        from . import mxu
        w8_roots, ab = mxu_table_specs(field, n, root, scale)
        levels = mxu_levels(n, field.element_size)
        params = field.params
        w8s = []
        for lvl, (m, w8_root) in enumerate(zip(levels, w8_roots)):
            sc = scale if lvl == 0 else 1
            w8s.append(jnp.asarray(mxu.w_digits(field, m, w8_root, sc)))
        self.w8s = tuple(w8s)
        self.ab = []
        for m, spec in zip(levels, ab):
            if spec is None:
                self.ab.append(None)
            elif spec[0] == "d":
                _, w_l, rest, tc = spec
                self.ab.append({"p": jnp.asarray(
                    _direct_panel_np(params, w_l, m, rest, tc))})
            else:
                _, a_seed, ca, b_seed, sb = spec
                # A stored [cols(h), L, m]: the kernel selects h via a
                # block-1 leading dim (lane-width-1 blocks are illegal)
                self.ab.append({
                    "a": jnp.asarray(np.transpose(
                        _panel_grid_np(params, a_seed, m, ca), (2, 0, 1))),
                    "b": jnp.asarray(_panel_grid_np(params, b_seed, m, sb))})

    def bundle(self):
        return {"w8s": self.w8s, "ab": tuple(self.ab)}


def _panel_grid_np(params, seed: int, rows: int, cols: int) -> np.ndarray:
    """[L, rows, cols] Montgomery grid g[k, t] = seed^(k*t), host-built."""
    from ..field.limbs import power_series_mont_np
    p = params.modulus
    out = np.zeros((params.L, rows, cols), dtype=np.uint32)
    cur = 1
    for k in range(rows):                  # row k = power series of seed^k
        out[:, k, :] = power_series_mont_np(params, cur, cols)
        cur = (cur * seed) % p
    return out


def _direct_panel_np(params, seed: int, rows: int, rest: int,
                     Tc: int = 128) -> np.ndarray:
    """[L, rows, Tc] direct twiddle panel g[k, t] = seed^(k * (t % rest)) —
    the period-`rest` pattern pre-tiled to one column tile (rest | Tc)."""
    small = _panel_grid_np(params, seed, rows, rest)
    return np.tile(small, (1, 1, Tc // rest))


@lru_cache(maxsize=None)
def get_mxu_plan(field: PrimeField, n: int, root: int,
                 scale: int = 1) -> MxuPlan:
    return MxuPlan(field, n, root, scale)


def mxu_transform_core(field: PrimeField, a: jnp.ndarray, n: int,
                       tabs) -> jnp.ndarray:
    """Multi-level MXU NTT: natural order in and out, bit-identical to
    ntt_core_table times the plan's folded scale (values canonical < p).
    a: [..., L, n]; tabs: MxuPlan.bundle() (traced arrays).

    Generalizes the 4-step/Bailey decomposition to levels of size <= 128 —
    each level: digit-encode (elementwise), ONE int8 transpose into kernel
    layout, and the Pallas digit-matmul DFT with the level's twiddle fused
    into its epilogue.  Intermediate data never round-trips through u32
    transposes: the only u32 reorder is the single final transpose to
    natural order."""
    levels = mxu_levels(n, field.element_size)
    q = len(levels)
    L = a.shape[-2]
    batch_shape = a.shape[:-2]
    x = a.reshape((-1, L, n)) if batch_shape else a[None]
    Bc = x.shape[0]
    from . import mxu

    cur = jnp.moveaxis(x, 1, 0)                        # [L, Bc, n]
    pre = Bc
    rest = n
    digit_native = False                               # cur holds int8 digits
    for lvl, m in enumerate(levels):
        rest //= m
        curv = cur.reshape(cur.shape[0], pre, m, rest)
        # digit-native chaining: every level except the last emits int8
        # digit planes from its epilogue, so the standalone encode pass
        # exists only before level 0 and the inter-level transpose moves
        # 17 int8 planes instead of 8 u32 limbs (~47% less HBM traffic)
        d = curv if digit_native else mxu.encode_digits(curv)
        d = jnp.transpose(d, (0, 2, 1, 3)).reshape(d.shape[0], m, pre * rest)
        tw = tabs["ab"][lvl] if rest > 1 else None
        out_dig = lvl < q - 1
        o = mxu.run_dft_level(field, tabs["w8s"][lvl], d, m, rest, tw,
                              out_digits=out_dig)
        cur = o.reshape(o.shape[0], m * pre, rest)     # pre' = (k_lvl, pre)
        digit_native = out_dig
        pre *= m
    # cur: [L, k_q, ..., k_1, Bc] -> [Bc, L, (k_q, ..., k_1)]
    cur = cur.reshape((L,) + tuple(reversed(levels)) + (Bc,))
    perm = (q + 1, 0) + tuple(range(1, q + 1))
    out = jnp.transpose(cur, perm).reshape(Bc, L, n)
    return out.reshape(batch_shape + (L, n)) if batch_shape else out[0]


def _bitrev_indices(n: int) -> jnp.ndarray:
    """Bit-reversal permutation of 0..n-1, computed on device from an iota
    (nothing host-built is uploaded)."""
    bits = n.bit_length() - 1
    idx = jax.lax.iota(jnp.int32, n)
    rev = jnp.zeros_like(idx)
    for b in range(bits):
        rev = rev | (((idx >> b) & 1) << (bits - 1 - b))
    return rev


def _ntt_core(field: PrimeField, a: jnp.ndarray, plan) -> jnp.ndarray:
    """Plan-based wrapper over ntt_core_table (kept for callers that hold an
    NttPlan, e.g. the distributed transforms).  Uses the plan's prebuilt
    4-step panel when one exists."""
    if plan.panel is not None:
        return _four_step_core(field, a, plan.n, plan.w_table,
                               panel=plan.panel)
    return ntt_core_table(field, a, plan.n, plan.w_table)


@lru_cache(maxsize=None)
def _four_step_local(n: int) -> bool:
    """True when an n-point transform should run as the single-chip 4-step
    decomposition (see ntt_core_table): n large enough that the direct path
    would need large-m split-stage kernels (half > _MBLK), and both local
    sizes fully covered by the multi-stage kernel.  GENSTARK_NTT_4STEP=0
    forces the direct per-stage path."""
    import os
    if os.environ.get("GENSTARK_NTT_4STEP") == "0":
        return False
    from .pallas_kernels import _MBLK
    if n // 2 <= _MBLK:
        return False
    if n > (1 << 21):
        # the twiddle panel / full-domain table are O(n) temps — at the
        # split-mode domain sizes (2^22+) that is GB-scale, so very large
        # transforms keep the per-stage kernels (their per-size compile
        # cost amortizes: only the largest configs reach them)
        return False
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    return 4 <= n1 and n2 // 2 <= _MBLK


def _four_step_core(field: PrimeField, a: jnp.ndarray, n: int,
                    w_table: jnp.ndarray, panel: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """Single-chip 4-step (Bailey) NTT: natural order in and out.

    a: [..., L, n] Montgomery; w_table: [L, n/2] half-table (may be traced).
    View the input as A[i1, i2] (i = i1*n2 + i2); then
    X[k1 + n1*k2] = sum_{i2} w^(i2*k1) w2^(i2*k2) [sum_{i1} w1^(i1*k1) A[i1,i2]]
    with w1 = w^n2, w2 = w^n1 — two batched local transforms around one
    twiddle multiply.  The twiddle panel T[k1, i2] = w^(k1*i2) is one gather
    from the full-domain table (k1*i2 < n1*n2 = n, so indices never wrap);
    the full table's upper half is -(lower half) since w^(n/2) = -1.
    Callers that hold the panel as a precomputed program parameter (the
    fused prover's table pack) pass it as `panel` [L, n] flat row-major,
    skipping the in-program table build + gather entirely.
    """
    dev = field.device
    L = a.shape[-2]
    batch_shape = a.shape[:-2]
    x = a.reshape((-1, L, n)) if batch_shape else a[None]       # [B, L, n]
    B = x.shape[0]
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1

    # local half-tables: the size-m canonical root is w^(n/m), whose powers
    # are every (n/m)-th entry of w_table (same picks as ntt_dist)
    w1t = w_table.reshape(L, n1 // 2, n2)[:, :, 0]              # w^n2 powers
    w2t = w_table.reshape(L, n2 // 2, n1)[:, :, 0]              # w^n1 powers

    if panel is not None:
        tw = panel.reshape(L, n1, n2)
    else:
        full = jnp.concatenate([w_table, dev._neg(w_table)], axis=1)  # [L, n]
        idx = (jax.lax.iota(jnp.int32, n1)[:, None] *
               jax.lax.iota(jnp.int32, n2)[None, :])            # [n1, n2] < n
        tw = jnp.take(full, idx.reshape(-1), axis=1).reshape(L, n1, n2)

    y = x.reshape(B, L, n1, n2)
    y = jnp.transpose(y, (0, 3, 1, 2))                          # [B, n2, L, n1]
    y = ntt_core_table(field, y, n1, w1t)                       # NTT over i1
    ym = jnp.transpose(y, (2, 0, 3, 1))                         # [L, B, k1, n2]
    ym = dev.mont_mul(ym, tw[:, None])
    y = jnp.transpose(ym, (1, 2, 0, 3))                         # [B, k1, L, n2]
    y = ntt_core_table(field, y, n2, w2t)                       # NTT over i2
    out = jnp.transpose(y, (0, 2, 3, 1)).reshape(B, L, n)       # X[k1+n1*k2]
    return out.reshape(batch_shape + (L, n)) if batch_shape else out[0]


def ntt_core_table(field: PrimeField, a: jnp.ndarray, n: int,
                   w_table: jnp.ndarray) -> jnp.ndarray:
    """Core transform. a: [..., L, n] (Montgomery). Returns same shape.
    w_table: [L, n/2] twiddle half-table (Montgomery) — may be a traced
    argument (the fused prover passes power tables as program parameters so
    they are never baked into executables as literals).

    The log2(n) butterfly stages are unrolled with reshape-paired operands:
    stage with half-size m views the data as [L, B, n/2m, 2, m] so every
    butterfly is a large contiguous elementwise Montgomery op on the VPU.
    (A fori_loop formulation with gather-derived lo/hi indexing compiles to
    a far smaller program but runs ~100x slower — dynamic gathers along the
    lane axis defeat TPU vectorization; measured 13.7M butterflies/s vs
    >1B/s for this form.)  Per-stage twiddles are picked from the half-table
    by reshape+slice (a strided slice at large stride OOMs scoped VMEM).
    """
    dev = field.device
    if n == 1:
        return a
    # Mosaic requires >= 8 sublanes per block: small-limb fields (p32: L=2)
    # run the jnp formulation (their MXU path covers the large transforms)
    use_pallas = _use_pallas() and a.shape[-2] >= 8
    if use_pallas and _four_step_local(n):
        # Large transforms run as a LOCAL 4-step (Bailey) decomposition
        # n = n1*n2: batched n1-point NTTs (slow axis), one twiddle
        # multiply by w^(k1*i2), batched n2-point NTTs (minor axis), final
        # transpose to natural order.  Both local sizes fit the single
        # multi-stage VMEM kernel entirely, so NO large-m split-stage
        # kernels are ever compiled: one small Mosaic kernel per local
        # size replaces one per (n, m >= 4096) stage — the dominant share
        # of the executable on the remote-compile backend — and each
        # replaced stage pass becomes a cheap XLA transpose/gather pass.
        # Same decomposition as the distributed transform
        # (parallel/ntt_dist.py), single-chip.
        return _four_step_core(field, a, n, w_table)
    S = n.bit_length() - 1
    batch_shape = a.shape[:-2]
    L = a.shape[-2]
    # normalize to [L, B, n]
    x = a.reshape((-1, L, n)) if batch_shape else a[None]
    x = jnp.swapaxes(x, 0, 1)                                   # [L, B, n]
    x = jnp.take(x, _bitrev_indices(n), axis=-1)
    B = x.shape[1]

    if _use_loop_stages():
        x = _loop_stage_core(field, x, n, w_table)
        x = jnp.swapaxes(x, 0, 1)                               # [B, L, n]
        return x.reshape(batch_shape + (L, n)) if batch_shape else x[0]

    half = n // 2
    if use_pallas:
        # all stages with m <= _MBLK in one multi-stage VMEM kernel, the
        # remaining large-m stages as split-operand kernels
        from .pallas_kernels import butterfly_stage2, multistage
        x2 = jnp.swapaxes(x, 0, 1).reshape(B * L, n)  # batch-major limb rows
        x2, last_m = multistage(field, x2, w_table, L, n)
        m = last_m * 2
        while m < n:
            stride = half // m
            g = n // (2 * m)
            tw = w_table.reshape(L, m, stride)[:, :, 0]
            twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)
            x2 = butterfly_stage2(field, x2, twf, L, n, m)
            m *= 2
        x = x2.reshape(B, L, n)                                 # [B, L, n]
        return x.reshape(batch_shape + (L, n)) if batch_shape else x[0]

    m = 1
    while m < n:
        stride = half // m
        g = n // (2 * m)
        # w_table[:, ::stride][:, :m] without a strided slice:
        tw = w_table.reshape(L, m, stride)[:, :, 0]             # [L, m]
        twf = jnp.broadcast_to(tw[:, None, :], (L, g, m)).reshape(L, half)
        y = x.reshape(L, B, g, 2, m)
        # flatten operands to [L, B, n/2] so the elementwise Montgomery
        # ops always see a huge minor dimension
        lo = y[:, :, :, 0, :].reshape(L, B, half)
        hi = y[:, :, :, 1, :].reshape(L, B, half)
        t = dev.mont_mul(hi, twf[:, None, :])
        new_lo = dev._add(lo, t)
        new_hi = dev._sub(lo, t)
        x = jnp.stack([new_lo.reshape(L, B, g, m),
                       new_hi.reshape(L, B, g, m)], axis=-2).reshape(L, B, n)
        m *= 2

    x = jnp.swapaxes(x, 0, 1)                                   # [B, L, n]
    return x.reshape(batch_shape + (L, n)) if batch_shape else x[0]


def ntt(field: PrimeField, values: jnp.ndarray, n: Optional[int] = None) -> jnp.ndarray:
    """Forward NTT: evaluations of the polynomial (coeffs=values) at the
    powers of the canonical n-th root of unity.  values: [L, n] or [B, L, n]."""
    n = n or values.shape[-1]
    return _jitted_transform(field, n, False)(values)


def intt(field: PrimeField, values: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT: interpolation over the canonical domain (galois
    `interpolateRoots`).  Scales by n^-1."""
    n = values.shape[-1]
    return _jitted_transform(field, n, True)(values)


def low_degree_extend(field: PrimeField, coeffs: jnp.ndarray, target_n: int) -> jnp.ndarray:
    """Evaluate polynomial(s) given by coeffs [..., L, n] over the canonical
    domain of size target_n >= n (galois `evalPolysAtRoots` on a larger
    domain, i.e. the LDE step at /root/reference/lib/Stark.ts:109)."""
    src_n = coeffs.shape[-1]
    if target_n < src_n:
        raise ValueError("target domain smaller than coefficient count")
    if target_n > src_n:
        pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, target_n - src_n)]
        coeffs = jnp.pad(coeffs, pad)
    return ntt(field, coeffs, target_n)
