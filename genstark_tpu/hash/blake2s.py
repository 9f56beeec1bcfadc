"""Vectorized BLAKE2s-256 over uint32 word lanes (device) + hashlib host path.

The reference's perf-tuned examples use blake2s256 as the Merkle hash
(e.g. /root/reference/examples/mimc/mimc128.ts:23, supported algorithms at
/root/reference/lib/Stark.ts:19-20).  This implementation matches RFC 7693
BLAKE2s with digest_length=32, no key — identical to python hashlib.blake2s.

Message convention matches sha256.py: uint32 LE-byte words in and out
(BLAKE2s is natively little-endian, so no byteswaps are needed), in the
WORD-MAJOR layout — messages uint32[W, B], digests uint32[8, B] — so every
word is a full [B] lane vector and no buffer pays the 16x tile padding a
batch-major [B, 8] minor dimension costs on TPU (see sha256.py docstring).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

_IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32)

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress(h, m, t, last):
    """h: [8, B]; m: [16, B] message words (word-major); t: byte counter
    (int); last: bool.

    The 10 rounds run as a `fori_loop` with the per-round message
    permutation done as static row picks per switch branch — executable
    size is the dominant one-time cost on the tunnelled-TPU backend, and
    this body is inlined into every Merkle level loop (see
    merkle._tree_builder).
    """
    B = h.shape[-1]
    iv = jnp.broadcast_to(jnp.asarray(_IV)[:, None], (8, B))
    v = jnp.concatenate([h, iv], axis=0)                         # [16, B]
    v = v.at[12].set(v[12] ^ jnp.uint32(t & 0xFFFFFFFF))
    v = v.at[13].set(v[13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF))
    if last:
        v = v.at[14].set(v[14] ^ jnp.uint32(0xFFFFFFFF))

    # static G wiring: column step then diagonal step
    A = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    B = np.array([4, 5, 6, 7, 5, 6, 7, 4])
    C = np.array([8, 9, 10, 11, 10, 11, 8, 9])
    D = np.array([12, 13, 14, 15, 15, 12, 13, 14])

    def G(a, b, c, d, x, y):
        a = a + b + x
        d = _rotr(d ^ a, 16)
        c = c + d
        b = _rotr(b ^ c, 12)
        a = a + b + y
        d = _rotr(d ^ a, 8)
        c = c + d
        b = _rotr(b ^ c, 7)
        return a, b, c, d

    def _pick(arr, idxs):
        # static row picks — each picked word is a full [B] lane vector
        return jnp.stack([arr[int(j)] for j in idxs], axis=0)

    def make_round(s):
        # closes over `m` (never enters the loop carry: carrying it through
        # fori_loop breaks under shard_map — the switch output comes back
        # shard-varying while the input carry is unvarying)
        def round_fn(v):
            ms = _pick(m, s)                                     # [16, B]
            for half in range(2):
                ia, ib = A[4 * half:4 * half + 4], B[4 * half:4 * half + 4]
                ic, id_ = C[4 * half:4 * half + 4], D[4 * half:4 * half + 4]
                a, b, c, d = (_pick(v, ia), _pick(v, ib),
                              _pick(v, ic), _pick(v, id_))
                x = ms[8 * half + 0::2][:4]
                y = ms[8 * half + 1::2][:4]
                a, b, c, d = G(a, b, c, d, x, y)
                src = {}
                for k in range(4):
                    src[int(ia[k])] = (a, k)
                    src[int(ib[k])] = (b, k)
                    src[int(ic[k])] = (c, k)
                    src[int(id_[k])] = (d, k)
                v = jnp.stack([src[word][0][src[word][1]]
                               for word in range(16)], axis=0)
            return v

        return round_fn

    rounds = [make_round(s) for s in _SIGMA]

    def round_body(r, v):
        # one compiled branch per round: sigma is applied as STATIC column
        # picks inside each branch (a per-round dynamic sigma gather would
        # be a lane gather — the slow path on TPU)
        return jax.lax.switch(r, rounds, v)

    # Under shard_map the initial v is built purely from constants (IV), so
    # its varying-manual-axes type is "unvarying", while the loop body mixes
    # in the shard-varying message m — the fori_loop carry types would then
    # mismatch.  XOR with (m & 0) is free after XLA folding but gives v the
    # same varying type as m, without needing the mesh axis names here.
    v = v ^ (m & jnp.uint32(0))
    v = jax.lax.fori_loop(0, 10, round_body, v)
    return h ^ v[:8] ^ v[8:]


def digest_rows_le(words_le: jnp.ndarray, msg_bytes: int) -> jnp.ndarray:
    """BLAKE2s-256 of B equal-length messages (word-major layout).

    words_le: uint32[ceil(msg_bytes/4), B] LE-byte words (partial word
    zero-padded).  Returns uint32[8, B] digests in LE-word form.
    """
    n_words, B = words_le.shape
    assert n_words == (msg_bytes + 3) // 4
    n_blocks = max(1, (msg_bytes + 63) // 64)
    total_words = n_blocks * 16
    if total_words > n_words:
        pad = jnp.zeros((total_words - n_words, B), dtype=jnp.uint32)
        msg = jnp.concatenate([words_le, pad], axis=0)
    else:
        msg = words_le

    # parameter block: digest_length=32, fanout=1, depth=1
    h = jnp.broadcast_to(jnp.asarray(_IV)[:, None], (8, B))
    h = h.at[0].set(h[0] ^ jnp.uint32(0x01010020))

    for blk in range(n_blocks):
        last = blk == n_blocks - 1
        t = msg_bytes if last else (blk + 1) * 64
        h = _compress(h, msg[blk * 16:(blk + 1) * 16], t, last)
    return h


def digest_host(data: bytes) -> bytes:
    return hashlib.blake2s(data).digest()
