"""Pallas TPU kernels for batched sha256 / blake2s256 compression.

The jnp compressors (sha256.py / blake2s.py) keep the per-program footprint
small by running rounds in a fori_loop + switch — the right trade for
programs that are compiled over the tunnelled backend once and dispatched
rarely.  But as the Merkle workhorse they leave a lot on the table: every
round re-materializes the [16, B] state through HBM-visible stacks.  This
kernel unrolls ALL rounds over Python-list word variables inside VMEM — the
state never exists as an array at all, just 16 live (1, TB) vector values —
so one grid step streams a [W, TB] message block from HBM, does the whole
compression in-register, and writes [8, TB] out.  This is the analog of the
reference's WASM blake2s hot path (/root/reference/lib/Stark.ts:113-118).

Layout matches the hash layer: word-major uint32[W, B] messages in,
uint32[8, B] digests out, LE-byte words.  Message padding (terminator bytes,
bit lengths, zero blocks) is synthesized in-kernel from static word indices,
so the caller passes exactly the raw message words.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blake2s as _b2
from . import sha256 as _sh

@lru_cache(maxsize=None)
def _lanes() -> int:
    """Batch lanes per grid step.  Swept on v5e (blake2s pair-hash levels,
    96 chained in-program, fetch-forced): 303M hashes/s at 512 lanes, 349M
    at 1024, 378M at 2048 — wider blocks amortize per-grid-step overhead and
    Mosaic handles the register pressure, so 2048 stays the default."""
    import os
    import warnings
    raw = os.environ.get("GENSTARK_PALLAS_HASH_LANES", "")
    try:
        return int(raw) if raw else 2048
    except ValueError:
        warnings.warn(f"GENSTARK_PALLAS_HASH_LANES={raw!r} is not an int; "
                      "using default 2048")
        return 2048


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _bswap(x):
    return ((x >> np.uint32(24)) |
            ((x >> np.uint32(8)) & np.uint32(0xFF00)) |
            ((x << np.uint32(8)) & np.uint32(0xFF0000)) |
            (x << np.uint32(24)))


def _raw_word_fn(refs, n_words, tb, limbs_per_elem):
    """Static word getter over the kernel's message refs.

    limbs_per_elem == 0: refs = (msg_ref,), word i = msg_ref[i].
    limbs_per_elem == W2*2: refs = V limb arrays [L, tb] (standard-form
    16-bit limbs); word i = LE word k of element vector v (i = v*W2 + k),
    built IN-KERNEL as lo | hi << 16 — the leaf-serialization buffer
    (elements_to_words + concatenate, a full copy of all committed data)
    never exists."""
    if not limbs_per_elem:
        msg_ref = refs[0]

        def word(i):
            if i < n_words:
                return msg_ref[i:i + 1, :]
            return jnp.zeros((1, tb), jnp.uint32)
        return word
    w2 = limbs_per_elem // 2

    def word(i):
        if i < n_words:
            v, k = divmod(i, w2)
            r = refs[v]
            return r[2 * k:2 * k + 1, :] | \
                (r[2 * k + 1:2 * k + 2, :] << np.uint32(16))
        return jnp.zeros((1, tb), jnp.uint32)
    return word


def _blake2s_kernel(*args, n_words, msg_bytes, tb, limbs_per_elem=0):
    *refs, out_ref = args
    n_blocks = max(1, (msg_bytes + 63) // 64)
    word = _raw_word_fn(tuple(refs), n_words, tb, limbs_per_elem)

    h = [jnp.full((1, tb), np.uint32(v), jnp.uint32) for v in _b2._IV]
    h[0] = h[0] ^ np.uint32(0x01010020)       # digest_length=32, fanout/depth=1

    for blk in range(n_blocks):
        last = blk == n_blocks - 1
        t = msg_bytes if last else (blk + 1) * 64
        m = [word(blk * 16 + j) for j in range(16)]
        v = list(h) + [jnp.full((1, tb), np.uint32(x), jnp.uint32)
                       for x in _b2._IV]
        v[12] = v[12] ^ np.uint32(t & 0xFFFFFFFF)
        # t >> 32 is always 0 here (messages are tiny); v[13] unchanged
        if last:
            v[14] = v[14] ^ np.uint32(0xFFFFFFFF)

        for s in _b2._SIGMA:
            for gi, (a, b, c, d) in enumerate(
                    ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14),
                     (3, 7, 11, 15), (0, 5, 10, 15), (1, 6, 11, 12),
                     (2, 7, 8, 13), (3, 4, 9, 14))):
                x, y = m[s[2 * gi]], m[s[2 * gi + 1]]
                va, vb, vc, vd = v[a], v[b], v[c], v[d]
                va = va + vb + x
                vd = _rotr(vd ^ va, 16)
                vc = vc + vd
                vb = _rotr(vb ^ vc, 12)
                va = va + vb + y
                vd = _rotr(vd ^ va, 8)
                vc = vc + vd
                vb = _rotr(vb ^ vc, 7)
                v[a], v[b], v[c], v[d] = va, vb, vc, vd

        h = [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]

    for i in range(8):
        out_ref[i:i + 1, :] = h[i]


def _sha256_kernel(*args, n_words, msg_bytes, tb, limbs_per_elem=0):
    *refs, out_ref = args
    n_blocks = (msg_bytes + 9 + 63) // 64
    term_word = msg_bytes // 4
    term_be = np.uint32(int(_bswap(np.uint32(0x80 << ((msg_bytes % 4) * 8)))))
    bitlen = msg_bytes * 8
    raw = _raw_word_fn(tuple(refs), n_words, tb, limbs_per_elem)

    def word(i):
        # BE word i of the padded message, synthesized from static index
        base = None
        if i < n_words:
            base = _bswap(raw(i))
        extra = np.uint32(0)
        if i == term_word:
            extra = term_be
        if i == n_blocks * 16 - 1:
            extra = np.uint32(bitlen & 0xFFFFFFFF)
        if i == n_blocks * 16 - 2:
            extra = np.uint32(bitlen >> 32)
        if base is None:
            return jnp.full((1, tb), extra, jnp.uint32)
        return base ^ extra if extra else base

    v = [jnp.full((1, tb), np.uint32(x), jnp.uint32) for x in _sh._H0]
    for blk in range(n_blocks):
        w = [word(blk * 16 + j) for j in range(16)]
        a, b, c, d, e, f, g, h = v
        for r in range(64):
            if r >= 16:
                w1, w9, w14 = w[(r + 1) % 16], w[(r + 9) % 16], w[(r + 14) % 16]
                s0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> np.uint32(3))
                s1 = _rotr(w14, 17) ^ _rotr(w14, 19) ^ (w14 >> np.uint32(10))
                w[r % 16] = w[r % 16] + s0 + w9 + s1
            wt = w[r % 16]
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + np.uint32(int(_sh._K[r])) + wt
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            a, b, c, d, e, f, g, h = t1 + S0 + maj, a, b, c, d + t1, e, f, g
        v = [v[0] + a, v[1] + b, v[2] + c, v[3] + d,
             v[4] + e, v[5] + f, v[6] + g, v[7] + h]
        a, b, c, d, e, f, g, h = v

    for i in range(8):
        out_ref[i:i + 1, :] = _bswap(v[i])


@lru_cache(maxsize=None)
def _digest_call(algorithm: str, n_words: int, msg_bytes: int, batch: int,
                 interpret: bool):
    tb = min(_lanes(), batch)
    kern = _blake2s_kernel if algorithm == "blake2s256" else _sha256_kernel
    call = pl.pallas_call(
        partial(kern, n_words=n_words, msg_bytes=msg_bytes, tb=tb),
        out_shape=jax.ShapeDtypeStruct((8, batch), jnp.uint32),
        grid=(batch // tb,),
        in_specs=[pl.BlockSpec((n_words, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return jax.jit(call)


@lru_cache(maxsize=None)
def _digest_limbs_call(algorithm: str, n_vec: int, L: int, msg_bytes: int,
                       batch: int, interpret: bool, stride4: bool):
    """Leaf/row hashing straight off the standard-form limb arrays: the
    LE-word message build (lo | hi << 16) happens in-kernel, so the
    serialized leaf buffer (elements_to_words + concatenate — a full copy
    of all committed data, ~29 ms per 2^24-domain commit) never exists.

    stride4: the four 'vectors' are the quarters of ONE [L, 4*B] array
    (FRI row hashing) — expressed as four block-index-mapped views of the
    same input, so the strided quarter slices are never materialized."""
    tb = min(_lanes(), batch)
    kern = _blake2s_kernel if algorithm == "blake2s256" else _sha256_kernel
    n_words = msg_bytes // 4
    if stride4:
        nb = batch // tb

        def spec(k):
            return pl.BlockSpec((L, tb), lambda i, _k=k: (0, i + _k * nb),
                                memory_space=pltpu.VMEM)
        in_specs = [spec(k) for k in range(4)]
    else:
        in_specs = [pl.BlockSpec((L, tb), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)] * n_vec
    call = pl.pallas_call(
        partial(kern, n_words=n_words, msg_bytes=msg_bytes, tb=tb,
                limbs_per_elem=L),
        out_shape=jax.ShapeDtypeStruct((8, batch), jnp.uint32),
        grid=(batch // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return jax.jit(call)


def digest_limb_rows(vectors, element_size: int, algorithm: str,
                     interpret: bool = False) -> jnp.ndarray:
    """Hash.merge_element_rows without the host-side word assembly:
    vectors = V standard-form limb arrays [L, B]; message of column i is
    the little-endian element bytes of every vector at i, concatenated."""
    V = len(vectors)
    L, batch = vectors[0].shape
    call = _digest_limbs_call(algorithm, V, L, element_size * V, batch,
                              interpret, False)
    return call(*vectors)


def digest_stride4_rows(values, element_size: int, algorithm: str,
                        interpret: bool = False) -> jnp.ndarray:
    """Hash.digest_stride_rows without materializing the quarter slices:
    values [L, N] -> [8, N/4], row r = H(v[r] || v[r+M] || v[r+2M] ||
    v[r+3M]) with M = N/4."""
    L, N = values.shape
    M = N // 4
    call = _digest_limbs_call(algorithm, 4, L, element_size * 4, M,
                              interpret, True)
    return call(values, values, values, values)


@lru_cache(maxsize=None)
def _min_batch() -> int:
    """Smallest batch routed to the Pallas kernel.  Every distinct batch
    size is a separate Mosaic kernel compile inside the enclosing XLA
    program, and on the remote-compile backend each one lengthens the
    one-time warmup; the small Merkle levels are a geometric tail of the
    runtime, so hashing them with the plain-jnp compressors costs ~nothing
    per proof while dropping kernel compiles from the program.

    Default 16384 is measured, not guessed (scripts/hash_sweep.py on v5e,
    HASHSWEEP_r03.json): per tree level the Pallas kernel beats the jnp
    compressors by 1.4-1.8x at batches >= 2^14 (1.77 vs 2.06 ms at 2^14,
    1.86 vs 3.30 ms at 2^17) and is a wash at 2^13 (1.99 vs 1.81 ms), so
    routing <2^14 to jnp trades ~zero runtime for one fewer Mosaic compile
    per tree."""
    import os
    import warnings
    raw = os.environ.get("GENSTARK_PALLAS_HASH_MIN", "")
    try:
        return int(raw) if raw else 16384
    except ValueError:
        warnings.warn(f"GENSTARK_PALLAS_HASH_MIN={raw!r} is not an int; "
                      "using default 16384")
        return 16384


def supported(batch: int) -> bool:
    """The kernel wants whole (8, 128)-tile lane blocks."""
    return batch >= max(256, _min_batch()) and batch % 256 == 0


def digest_rows_le(words_le: jnp.ndarray, msg_bytes: int,
                   algorithm: str, interpret: bool = False) -> jnp.ndarray:
    """Pallas path of Hash.digest_rows: uint32[W, B] LE words -> [8, B]."""
    n_words, batch = words_le.shape
    assert n_words == (msg_bytes + 3) // 4
    tb = min(_lanes(), batch)
    assert batch % tb == 0 and batch % 256 == 0
    return _digest_call(algorithm, n_words, msg_bytes, batch,
                        interpret)(words_le)
