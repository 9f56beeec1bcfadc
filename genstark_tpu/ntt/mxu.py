"""MXU (int8-matmul) modular DFT — the production NTT core for the
solinas-foldable fields (p128 AND p32) on TPU.

The VPU butterfly kernels are compute-bound at ~888M Montgomery muls/s
(ROOFLINE_r03.json); the MXU executes s8 x s8 -> s32 matmuls two orders of
magnitude faster.  In a multi-level (Bailey/4-step generalized) NTT every
local transform IS a matmul against the DFT matrix

    X[r] = sum_c W[r, c] * x[c]  (mod p),  W[r, c] = w^(r*c)

so the transform's hot loop rides the MXU ("tensor-core NTT" family, adapted
to TPU int8 matmuls; replaces galois's WASM `evalPolysAtRoots` /
`interpolateRoots` consumed at /root/reference/lib/Stark.ts:106-109):

- W and x are decomposed into D = element_size + 1 signed base-256 digits
  (int8; balanced recode, digits in [-128, 127], top digit in {0, 1}) —
  17 for the 128-bit field, 5 for the 32-bit field,
- the D x D digit products are s8 matmuls accumulated in s32: max
  |S_k| <= D * m * 128^2 < 2^30 for local size m <= 2048 -> no overflow,
- the 2D-1 digit-diagonal sums S_k recombine as sum_k S_k * 2^(8k) into
  lazy 16-bit limbs (bias 2^30 makes them nonnegative; a precomputed
  correction constant cancels the bias mod p),
- the wide integer reduces by solinas folding for any supported modulus
  p = 2^(16L) - u*2^(16a) + 1 with u < 2^16 (see `solinas_spec`):
  hi * 2^(16L) == hi * (u*2^(16a) - 1); small fields chunk-reduce via tiny
  in-kernel Montgomery multiplies first (the fold tail converges slowly
  when u*2^(16a) is close to 2^(16L)).

Values are representation-agnostic: the DFT is linear, so Montgomery-form
inputs produce Montgomery-form outputs bit-identical to the VPU butterfly
path (both canonical < p) — the MXU path is plug-compatible anywhere in the
prover pipeline.

Two implementations of the same math:
- `mxu_dft_ref`: plain-XLA (runs everywhere; the CPU correctness oracle),
- `mxu_dft_pallas`: one Pallas kernel per (m, tile) whose s32 digit
  accumulators live entirely in VMEM and whose epilogue (recombination +
  solinas reduction) is fused — the s32 intermediates NEVER touch HBM,
  which is what limits the XLA formulation (measured ~47T MAC/s XLA vs
  >170T for VMEM-resident dots on v5e).

The W-digit matrices are HOST-built (numpy) and passed as program
PARAMETERS — an in-program gather build costs ~5-120 ms per local
(measured), and baked constants blow up executables (DESIGN_NOTES item 6).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field import PrimeField
from ..field.limbs import LIMB_BITS, LIMB_MASK

DIGIT_BITS = 8
D128 = 17                    # signed base-256 digits for 128-bit elements
N_DIAGS = 2 * D128 - 1       # 33 digit-diagonal sums
_M16 = np.uint32(LIMB_MASK)
_BIAS = np.int32(1 << 30)    # |S_k| <= 17 * m * 2^14 < 2^30 for m <= 2048
MAX_M = 2048                 # s32-accumulator + bias bound (see module doc)


@lru_cache(maxsize=None)
def solinas_spec(modulus: int):
    """Kernel-family parameters for a supported modulus, or None.

    Supported: p = 2^(16L) - t with t + 1 = u * 2^(16a), u < 2^16 — then
    the fold hi*2^(16L) -> hi*t is a limb-shifted small multiply minus hi
    (p128 = 2^128 - 9*2^32 + 1: u=9, a=2; p32 = 2^32 - 3*2^25 + 1:
    u=1536, a=1).  Returns (L 16-bit limbs, D signed base-256 digits,
    n_diags, u, a)."""
    eb = (modulus.bit_length() + 7) // 8
    if eb % 2 or (1 << (8 * eb)) < modulus:
        return None
    L = eb // 2
    t = (1 << (16 * L)) - modulus
    if t <= 0:
        return None
    tp = t + 1
    a = 0
    while tp % (1 << 16) == 0 and tp:
        tp >>= 16
        a += 1
    if tp >= (1 << 16):
        return None
    D = eb + 1
    return L, D, 2 * D - 1, tp, a


# --------------------------------------------------------------------- digits
@lru_cache(maxsize=None)
def _w_digits_np(modulus: int, m: int, root: int, scale: int) -> np.ndarray:
    """int8[D, m, m]: balanced base-256 digit planes of the (scaled) DFT
    matrix W[r, c] = scale * root^(r*c) mod p (canonical representatives).
    `scale` folds a uniform constant (e.g. the iNTT's n^-1) into the matrix
    for free.  Host-built: m pow-mods for the power table, then vectorized
    byte recode."""
    L, D, _, _, _ = solinas_spec(modulus)
    eb = 2 * L
    tab = np.zeros((m, eb), dtype=np.uint8)
    cur = scale % modulus
    for j in range(m):
        tab[j] = np.frombuffer(cur.to_bytes(eb, "little"), dtype=np.uint8)
        cur = (cur * root) % modulus
    r = np.arange(m, dtype=np.int64)
    E = (r[:, None] * r[None, :]) % m                   # exponent mod m
    bytes_ = tab[E]                                     # [m, m, eb] u8
    digs = np.zeros((D, m, m), dtype=np.int8)
    carry = np.zeros((m, m), dtype=np.int16)
    for i in range(eb):
        t = bytes_[:, :, i].astype(np.int16) + carry
        ge = t >= 128
        digs[i] = (t - ge * 256).astype(np.int8)
        carry = ge.astype(np.int16)
    digs[eb] = carry.astype(np.int8)
    return digs


def w_digits(field: PrimeField, m: int, root: int, scale: int = 1) -> np.ndarray:
    assert solinas_spec(field.modulus) is not None, \
        "MXU DFT needs a solinas-foldable modulus (see solinas_spec)"
    assert m <= MAX_M, f"m={m} exceeds the s32 accumulator bound ({MAX_M})"
    return _w_digits_np(field.modulus, m, root % field.modulus,
                        scale % field.modulus)


def encode_digit_rows(limbs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """L u32 16-bit-limb arrays (canonical) -> 2L+1 int8 balanced base-256
    digit arrays (x = sum d_i 256^i, top digit in {0, 1}).  Pure
    elementwise — runs identically on VMEM tiles inside a Pallas kernel
    (the digit-emitting epilogue) and in the XLA reference path."""
    digs = []
    c = jnp.zeros_like(limbs[0], dtype=jnp.int32)
    for t in range(len(limbs)):
        limb = limbs[t].astype(jnp.int32)
        for half in range(2):
            b = (limb >> (8 * half)) & 0xFF
            s = b + c
            ge = s >= 128
            digs.append(jnp.where(ge, s - 256, s).astype(jnp.int8))
            c = ge.astype(jnp.int32)
    digs.append(c.astype(jnp.int8))
    return digs


def encode_digits(x: jnp.ndarray) -> jnp.ndarray:
    """u32[L, ...] 16-bit limbs -> int8[2L+1, ...] balanced base-256 digits
    (x = sum d_i 256^i with the top digit in {0, 1})."""
    return jnp.stack(encode_digit_rows([x[t] for t in range(x.shape[0])]))


# ------------------------------------------------------------------- epilogue
def _propagate(limbs: List[jnp.ndarray], extra: int = 2) -> List[jnp.ndarray]:
    """Lazy u32 limbs (< 2^28 each) -> strict 16-bit limbs; appends `extra`
    limbs to capture the final carry."""
    out = []
    c = jnp.zeros_like(limbs[0])
    for x in limbs:
        s = x + c
        out.append(s & _M16)
        c = s >> np.uint32(LIMB_BITS)
    for _ in range(extra):
        out.append(c & _M16)
        c = c >> np.uint32(LIMB_BITS)
    return out


def _fold_once(strict: List[jnp.ndarray], L: int, u: int,
               a: int) -> List[jnp.ndarray]:
    """One solinas fold on STRICT 16-bit limbs for p = 2^(16L) - t,
    t = u*2^(16a) - 1:  value = lo + hi*u*2^(16a) - hi  (nonnegative:
    hi*u*2^(16a) >= hi).  No-op (identity) when len <= L."""
    if len(strict) <= L:
        return strict
    lo, hi = strict[:L], strict[L:]
    # A = u*hi << 16a as strict limbs (u < 2^16 -> lazy products < 2^32)
    A_lazy = [jnp.zeros_like(lo[0])] * a + [h * np.uint32(u) for h in hi]
    A = _propagate(A_lazy, extra=1)
    if len(A) < L:
        A += [jnp.zeros_like(lo[0])] * (L - len(A))
    # A - hi with borrow chain (integer-nonnegative => final borrow is 0)
    B = hi + [jnp.zeros_like(lo[0])] * (len(A) - len(hi))
    diff = []
    borrow = jnp.zeros_like(lo[0])
    for x, y in zip(A, B):
        s = x - y - borrow
        diff.append(s & _M16)
        borrow = (s >> np.uint32(31)) & np.uint32(1)
    # + lo (lazy), then re-propagate to strict
    for j in range(len(lo)):
        diff[j] = diff[j] + lo[j]
    return _propagate(diff, extra=1)


def _trim(strict: List[jnp.ndarray], p_limbs: np.ndarray,
          n_sub: int = 2) -> jnp.ndarray:
    """Strict limbs, value < (n_sub+1)*p representable in the low L limbs
    -> canonical [L, ...] via n_sub conditional subtracts."""
    L = len(p_limbs)
    out = jnp.stack(strict[:L])
    for _ in range(n_sub):
        diff = []
        borrow = jnp.zeros_like(out[0])
        for j in range(L):
            s = out[j] - np.uint32(p_limbs[j]) - borrow
            diff.append(s & _M16)
            borrow = (s >> np.uint32(31)) & np.uint32(1)
        take = (np.uint32(1) - borrow).astype(jnp.bool_)
        out = jnp.where(take, jnp.stack(diff), out)
    return out


@lru_cache(maxsize=None)
def _bias_correction(modulus: int) -> np.ndarray:
    """u32[L] 16-bit limbs of (-BIAS * sum_k 2^(8k)) mod p: adding this to
    the biased diagonal recombination cancels the bias exactly mod p."""
    L, _, nd, _, _ = solinas_spec(modulus)
    total = int(_BIAS) * sum(1 << (8 * k) for k in range(nd))
    corr = (-total) % modulus
    out = np.zeros(L, dtype=np.uint32)
    for j in range(L):
        out[j] = (corr >> (16 * j)) & 0xFFFF
    return out


def diags_to_limbs(acc: List[jnp.ndarray], p_limbs: np.ndarray,
                   corr: np.ndarray, modulus: int,
                   n0p: int = 0) -> jnp.ndarray:
    """2D-1 signed s32 digit-diagonal sums S_k [..] -> canonical u32[L, ..]
    16-bit limbs of (sum_k S_k 2^(8k)) mod p (p128: 33 diagonals -> 8
    limbs; p32: 9 -> 2).

    Each S_k is biased by 2^30 (making it a u32 < 2^31), placed into lazy
    16-bit limbs at bit offset 8k, the precomputed correction constant
    cancels the total bias mod p, and solinas folds + one conditional
    subtract reduce the wide integer to canonical form.  The fold count
    and per-fold limb lengths follow a STATIC value-bound: each fold maps
    value = lo + hi*2^(16L) (lo < 2^(16L)) to lo + hi*t, so bound' =
    min(2^(16L) - 1 + (bound >> 16L)*t,
        max(2^(16L) - 1, bound - 2^(16L) + t)), and limbs above the bound
    are provably zero and truncated — 3 ever-shorter folds for p128
    (was a fixed 6), a ~40% cut of the (VPU-bound at small m) epilogue.
    Pure elementwise jnp — runs identically inside a Pallas kernel (VMEM
    tiles) and in the XLA reference path."""
    L, _, nd, u, a = solinas_spec(modulus)
    w = 16 * L
    n_lazy = (8 * (nd - 1) + 31) // LIMB_BITS + 2
    limbs = [jnp.zeros_like(acc[0], dtype=jnp.uint32) for _ in range(n_lazy)]
    for j in range(L):
        limbs[j] = limbs[j] + np.uint32(corr[j])
    for k in range(nd):
        v = (acc[k] + _BIAS).astype(jnp.uint32)        # < 2^31
        lo = v & _M16
        hi = v >> np.uint32(LIMB_BITS)                 # < 2^15
        for part, extra_bits in ((lo, 0), (hi, LIMB_BITS)):
            bit = k * DIGIT_BITS + extra_bits
            pidx, off = bit // LIMB_BITS, bit % LIMB_BITS
            sh = part << np.uint32(off)                # <= 24 bits
            limbs[pidx] = limbs[pidx] + (sh & _M16)
            limbs[pidx + 1] = limbs[pidx + 1] + (sh >> np.uint32(LIMB_BITS))
    strict = _propagate(limbs, extra=2)
    # integer bound at entry: corr < p plus nd biased diagonals < 2^31 each
    bound = (1 << w) + sum((1 << 31) << (8 * k) for k in range(nd))
    t = u * (1 << (16 * a)) - 1
    if L <= 2 and len(strict) > 2 * L:
        # small fields (p32): the solinas tail t is only ~2^5 below
        # 2^(16L), so each plain fold sheds ~5 bits — a dozen folds for the
        # 95-bit diagonal value.  Instead reduce every 2^(16L)-chunk with
        # one TINY Montgomery multiply against (2^(16L*j) * R) mod p (the
        # fiat_shamir.digest_words_to_field_mont trick; a chunk < 2^(16L)
        # is a legal operand), then let the fold loop finish the
        # < 2^(16L) + n*p remainder in ~2 folds
        from .pallas_kernels import _mont_mul_limbs
        n_ch = -(-len(strict) // L)
        strict = strict + [jnp.zeros_like(strict[0])] * \
            (n_ch * L - len(strict))
        out = list(strict[:L])
        for j in range(1, n_ch):
            cj = (pow(2, w * j, modulus) * pow(2, w, modulus)) % modulus
            cl = [np.uint32((cj >> (16 * i)) & 0xFFFF) for i in range(L)]
            red = _mont_mul_limbs(strict[L * j:L * (j + 1)], cl, p_limbs,
                                  np.uint32(n0p))
            out = [out[i] + red[i] for i in range(L)]   # sums < n_ch * 2^16
        strict = _propagate(out, extra=1)
        bound = (1 << w) + (n_ch - 1) * modulus
    while bound >> w:
        strict = _fold_once(strict, L, u, a)
        generic = (1 << w) - 1 + (bound >> w) * t
        tight = max((1 << w) - 1, bound - (1 << w) + t)
        bound = min(generic, tight)
        n_limbs = max(L + 1, -(-bound.bit_length() // LIMB_BITS) + 1)
        strict = strict[:n_limbs]
    # post-fold value < 2^(16L) < 2p -> ONE conditional subtract
    return _trim(strict, p_limbs, n_sub=1)


# ------------------------------------------------------------- XLA reference
def mxu_dft_ref(field: PrimeField, y: jnp.ndarray, m: int,
                w8: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA digit-matmul DFT.  y: [..., L, m] 16-bit limbs (any batch
    shape, any representation); w8: int8[D, m, m].  Returns [..., L, m]."""
    batch_shape = y.shape[:-2]
    L = y.shape[-2]
    D = 2 * L + 1
    x = y.reshape((-1, L, m)) if batch_shape else y[None]
    B = x.shape[0]
    x8 = encode_digits(jnp.moveaxis(x, 1, 0))          # [D, B, m]
    x8 = jnp.moveaxis(x8, -1, 1).reshape(D, m, B)      # [D, m, B]
    acc = [None] * (2 * D - 1)
    for i in range(D):
        for j in range(D):
            prod = jax.lax.dot_general(
                w8[i], x8[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # [m, B]
            k = i + j
            acc[k] = prod if acc[k] is None else acc[k] + prod
    out = diags_to_limbs(acc, field.device._p_np,
                         _bias_correction(field.modulus), field.modulus,
                         int(field.device._n0p))       # [L, m, B]
    out = jnp.transpose(out, (2, 0, 1))                     # [B, L, m]
    return out.reshape(batch_shape + (L, m)) if batch_shape else out[0]


# --------------------------------------------------------------- Pallas path
def _mont_mul_tiles(a: List[jnp.ndarray], b: List[jnp.ndarray],
                    p_limbs: np.ndarray, n0p: np.uint32) -> List[jnp.ndarray]:
    from .pallas_kernels import _mont_mul_limbs
    return _mont_mul_limbs(a, b, p_limbs, n0p)


def level_tc(m: int) -> int:
    """Column-tile width for a level of size m: 128 for full-tile levels,
    wider for small m so each grid step still carries ~16K points of work
    (a small trailing level with Tc = 128 degenerates into tens of
    thousands of overhead-dominated grid steps)."""
    if m >= 128:
        return 128
    return min(2048, 128 * (128 // m))


def twiddle_split(rest: int, Tc: int = 128) -> int:
    """The factored-twiddle inner size s for a level with `rest` remaining
    columns: s >= Tc keeps every in-kernel twiddle op a plain 2-D broadcast
    (Mosaic rejects sub-lane reshapes); rest <= Tc uses a direct panel
    (s = 0 sentinel)."""
    if rest <= Tc:
        return 0
    b = rest.bit_length() - 1
    return max(1 << (-(-b // 2)), Tc)


def _make_dft_kernel(m: int, B: int, rest: int, s: int, p_limbs_bytes: bytes,
                     corr_bytes: bytes, n0p_int: int, Tr: int, Tc: int,
                     interpret: bool, out_digits: bool = False):
    """DFT kernel with (optionally) the level's twiddle multiply fused into
    the epilogue: out[k, col] = DFT_m(x)[k, col] * w_l^(k * (col % rest)).

    rest > Tc: twiddle factored as A[k, i2 // s] * B[k, i2 % s] with
    s >= Tc, so within one column tile A is a single broadcast column and B
    a contiguous [Tr, Tc] block — O(sqrt(rest)) table entries instead of an
    O(n) panel.  rest in (1, Tc]: one direct pre-tiled panel block.  All
    twiddle math is VMEM-tile mont_muls riding the kernel's residency
    (measured: the unfused XLA twiddle pass costs ~25 ms per 2^21 level)."""
    from jax.experimental import pallas as pl

    p_limbs = np.frombuffer(p_limbs_bytes, dtype=np.uint32)
    corr = np.frombuffer(corr_bytes, dtype=np.uint32)
    n0p = np.uint32(n0p_int)
    L = len(p_limbs)
    D = 2 * L + 1
    modulus = sum(int(p_limbs[i]) << (16 * i) for i in range(L))
    mode = "none" if rest <= 1 else ("direct" if s == 0 else "fact")

    def dft_tile(w_ref, x_ref):
        acc = [None] * (2 * D - 1)
        for i in range(D):
            w_i = w_ref[i]                             # [Tr, m]
            for j in range(D):
                prod = jax.lax.dot_general(
                    w_i, x_ref[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)  # [Tr, Tc]
                k = i + j
                acc[k] = prod if acc[k] is None else acc[k] + prod
        return diags_to_limbs(acc, p_limbs, corr, modulus,
                              n0p_int)                 # [L, Tr, Tc]

    def emit(out_ref, res):
        """res: L canonical u32 limb tiles.  out_digits: re-encode to int8
        digit planes in VMEM (the next level consumes digits directly —
        deletes the standalone encode pass and shrinks the inter-level
        transpose from u32 to int8)."""
        if out_digits:
            out_ref[...] = jnp.stack(encode_digit_rows(res))
        else:
            out_ref[...] = jnp.stack(res)

    if mode == "none":
        def kernel(w_ref, x_ref, out_ref):
            out = dft_tile(w_ref, x_ref)
            emit(out_ref, [out[i] for i in range(L)])
    elif mode == "direct":
        def kernel(w_ref, x_ref, p_ref, out_ref):
            out = dft_tile(w_ref, x_ref)
            ov = [out[i] for i in range(L)]
            pv = [p_ref[i] for i in range(L)]
            emit(out_ref, _mont_mul_tiles(ov, pv, p_limbs, n0p))
    else:
        def kernel(w_ref, x_ref, a_ref, b_ref, out_ref):
            out = dft_tile(w_ref, x_ref)
            ov = [out[i] for i in range(L)]
            # a_ref: [1, L, Tr] (h selected by the index map) -> [Tr, 1]
            av = [a_ref[0, i][:, None] for i in range(L)]
            bv = [b_ref[i] for i in range(L)]          # [Tr, Tc]
            panel = _mont_mul_tiles(av, bv, p_limbs, n0p)
            emit(out_ref, _mont_mul_tiles(ov, panel, p_limbs, n0p))

    grid = (m // Tr, B // Tc)
    in_specs = [pl.BlockSpec((D, Tr, m), lambda r, c: (0, r, 0)),
                pl.BlockSpec((D, m, Tc), lambda r, c: (0, 0, c))]
    if mode == "direct":
        # panel [L, m, Tc]: the period-`rest` pattern pre-tiled to Tc, the
        # same for every Tc-aligned column tile (rest | Tc)
        in_specs.append(pl.BlockSpec((L, Tr, Tc), lambda r, c: (0, r, 0)))
    elif mode == "fact":
        X = np.int32(rest // Tc)
        sT = np.int32(s // Tc)
        # lax.rem/div: plain C-style ops — jnp's % and // lower to sign-fix
        # jaxprs that Pallas index maps reject.  A is stored [rest//s, L, m]
        # (h leading) because a (.., 1)-lane block is illegal: the h select
        # rides a block-1 leading dim instead.
        in_specs.append(pl.BlockSpec(
            (1, L, Tr),
            lambda r, c: (jax.lax.div(jax.lax.rem(c, X), sT), 0, r)))
        in_specs.append(pl.BlockSpec(
            (L, Tr, Tc), lambda r, c: (0, r, jax.lax.rem(c, sT))))
    n_out = D if out_digits else L
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, m, B), jnp.int8 if out_digits else jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out, Tr, Tc), lambda r, c: (0, r, c)),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _dft_kernel_fn(m, B, rest, s, p_limbs_bytes, corr_bytes, n0p, Tr, Tc,
                   interpret, out_digits=False):
    return jax.jit(_make_dft_kernel(m, B, rest, s, p_limbs_bytes, corr_bytes,
                                    n0p, Tr, Tc, interpret, out_digits))


def mxu_dft(field: PrimeField, y: jnp.ndarray, m: int, w8: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """Single-level digit-matmul DFT on [..., L, m] data (no twiddle).
    Pallas on TPU (or interpret=True), XLA reference elsewhere."""
    assert m <= MAX_M and (m & (m - 1)) == 0
    if not (interpret or jax.default_backend() == "tpu"):
        return mxu_dft_ref(field, y, m, w8)
    batch_shape = y.shape[:-2]
    L = y.shape[-2]
    x = y.reshape((-1, L, m)) if batch_shape else y[None]
    B = x.shape[0]
    x8 = encode_digits(jnp.moveaxis(x, 1, 0))          # [D, B, m]
    x8 = jnp.moveaxis(x8, -1, 1)                       # [D, m, B]
    out = run_dft_level(field, w8, x8, m, 1, None, interpret)
    out = jnp.transpose(out, (2, 0, 1))                # [B, L, m]
    return out.reshape(batch_shape + (L, m)) if batch_shape else out[0]


def _run_dft_level_ref(field: PrimeField, w8: jnp.ndarray, x8: jnp.ndarray,
                       m: int, rest: int, tw,
                       out_digits: bool = False) -> jnp.ndarray:
    """Plain-XLA level (CPU correctness path): same math as the Pallas
    kernel — digit dots, shared epilogue, direct or factored twiddle."""
    dev = field.device
    L = dev.L
    D = 2 * L + 1
    cols = x8.shape[2]
    acc = [None] * (2 * D - 1)
    for i in range(D):
        for j in range(D):
            prod = jax.lax.dot_general(
                w8[i], x8[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # [m, cols]
            k = i + j
            acc[k] = prod if acc[k] is None else acc[k] + prod
    out = diags_to_limbs(acc, dev._p_np, _bias_correction(field.modulus),
                         field.modulus, int(dev._n0p))
    if rest > 1:
        if "p" in tw:                                  # direct panel [L,m,Tc]
            P = tw["p"]
            ov = out.reshape(L, m, cols // rest, rest)
            ov = dev.mont_mul(ov, P[:, :, None, :rest])
        else:
            A = jnp.transpose(tw["a"], (1, 2, 0))      # [h, L, m] -> [L, m, h]
            Bt = tw["b"]
            s = Bt.shape[-1]
            ov = out.reshape(L, m, cols // rest, rest // s, s)
            ov = dev.mont_mul(ov, A[:, :, None, :, None])
            ov = dev.mont_mul(ov, Bt[:, :, None, None, :])
        out = ov.reshape(L, m, cols)
    if out_digits:
        return encode_digits(out)
    return out


def run_dft_level(field: PrimeField, w8: jnp.ndarray, x8: jnp.ndarray,
                  m: int, rest: int, tw, interpret: bool = False,
                  out_digits: bool = False) -> jnp.ndarray:
    """Dispatch one (DFT + fused twiddle) level: x8 int8[D, m, cols] ->
    u32[8, m, cols] = DFT_m over the m axis, times w_l^(k * (col % rest)),
    or int8[D, m, cols] digit planes of the same values (out_digits — the
    digit-native inter-level format).
    tw: None (rest == 1), {"p": panel [L, m, 128]} (rest <= 128) or
    {"a": A [rest//s, L, m], "b": B [L, m, s]} (factored, s >= 128).
    m: any power of two <= 2048 (below 128 the blocks span the whole m axis,
    which Mosaic accepts; the dots just run a short contraction)."""
    assert m <= MAX_M and (m & (m - 1)) == 0
    if not interpret and jax.default_backend() != "tpu":
        return _run_dft_level_ref(field, w8, x8, m, rest, tw, out_digits)
    Tr, Tc = min(m, 128), level_tc(m)
    cols = x8.shape[2]
    cols_p = -(-cols // Tc) * Tc
    if cols_p != cols:
        x8 = jnp.pad(x8, [(0, 0), (0, 0), (0, cols_p - cols)])
    if rest <= 1:
        s, args = 1, ()
    elif "p" in tw:
        s, args = 0, (tw["p"],)
    else:
        s, args = tw["b"].shape[-1], (tw["a"], tw["b"])
    fn = _dft_kernel_fn(m, cols_p, rest if rest > 1 else 1, s,
                        field.device._p_np.tobytes(),
                        _bias_correction(field.modulus).tobytes(),
                        int(field.device._n0p), Tr, Tc, interpret,
                        out_digits)
    out = fn(w8, x8, *args)
    return out[:, :, :cols] if cols_p != cols else out
