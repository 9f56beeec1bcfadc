"""Vectorized SHA-256 over uint32 word lanes (device) + hashlib host path.

Replaces the reference merkle package's sha256 (created at
/root/reference/lib/Stark.ts:50 via `createHash`).  The device path hashes
B fixed-size messages at once — used for Merkle leaf rows
(`mergeVectorRows` / `digestValues` call sites: /root/reference/lib/Stark.ts:115,
/root/reference/lib/components/LowDegreeProver.ts:45,201) and tree levels.

Message convention: messages are given as uint32 arrays of *little-endian
byte words* — word w holds message bytes [4k..4k+3] as w & 0xff = byte 4k.
SHA-256 interprets the byte stream big-endian per word, so we byteswap in.
Digests are returned in the same LE-word form (8 words = 32 bytes).

Layout is WORD-MAJOR: messages are uint32[W, B] and digests uint32[8, B]
(word index in sublanes, batch in lanes).  The batch-major [B, 8] layout
tile-pads the 8-wide minor dimension to 128 lanes on TPU — a 16x HBM blowup
that alone exceeds device memory for the Merkle buffers of a 2^24-point
evaluation domain (512 MB of digests -> 8+ GB resident).  Word-major rows
are full [B]-long lane vectors, so every round operates on perfectly tiled
1-D vectors and carries a [16, B] state with zero padding.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def byteswap32(x):
    return ((x >> np.uint32(24)) |
            ((x >> np.uint32(8)) & np.uint32(0xFF00)) |
            ((x << np.uint32(8)) & np.uint32(0xFF0000)) |
            (x << np.uint32(24)))


def _compress(state, block):
    """state: [8, B], block: [16, B] BE words (word-major).

    The 64 rounds run as a `fori_loop` over 4 blocks of 16 statically
    indexed rounds: the loop keeps the compiled body small (per-program
    size is the dominant one-time cost on the tunnelled-TPU backend — this
    kernel is inlined into every Merkle tree level loop), while the static
    in-block word indexing avoids dynamic gathers (the schedule window
    rotates fully every 16 rounds, so indices are compile-time constants
    inside the block).  Each indexed word is a full [B] lane vector.
    """
    k_rows = jnp.asarray(_K.reshape(4, 16))

    def block16(o, carry):
        v, w = carry                            # v: [8, B], w: [16, B]
        krow = jax.lax.dynamic_index_in_dim(k_rows, o, axis=0, keepdims=False)
        cols = [w[j] for j in range(16)]
        for j in range(16):
            w1 = cols[(j + 1) % 16]
            w9 = cols[(j + 9) % 16]
            w14 = cols[(j + 14) % 16]
            w0 = cols[j]
            s0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> np.uint32(3))
            s1 = _rotr(w14, 17) ^ _rotr(w14, 19) ^ (w14 >> np.uint32(10))
            wt = jnp.where(o == 0, w0, w0 + s0 + w9 + s1)
            cols[j] = wt

            a, b, c, d, e, f, g, h = [v[i] for i in range(8)]
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + krow[j] + wt
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            v = jnp.stack([t1 + S0 + maj, a, b, c, d + t1, e, f, g], axis=0)
        return v, jnp.stack(cols, axis=0)

    # Same shard_map varying-manual-axes fix as blake2s._compress: the first
    # call's state is a pure-constant broadcast (H0) — unvarying — while the
    # loop output mixes in the shard-varying block.  (block & 0) is folded
    # away by XLA but gives state the same varying type as block.
    state = state ^ (block[:8] & jnp.uint32(0))
    v, _ = jax.lax.fori_loop(0, 4, block16, (state, block))
    return state + v




def digest_rows_le(words_le: jnp.ndarray, msg_bytes: int) -> jnp.ndarray:
    """SHA-256 of B equal-length messages (word-major layout).

    words_le: uint32[ceil(msg_bytes/4), B] LE-byte words (trailing partial
    word zero-padded).  Returns uint32[8, B] digests in LE-word form.
    """
    n_words, B = words_le.shape
    assert n_words == (msg_bytes + 3) // 4
    n_blocks = (msg_bytes + 9 + 63) // 64
    total_words = n_blocks * 16
    # build padded message in LE-word space, then swap to BE
    pad_words = jnp.zeros((total_words - n_words, B), dtype=jnp.uint32)
    msg = jnp.concatenate([words_le, pad_words], axis=0)
    # 0x80 terminator byte
    term_word = msg_bytes // 4
    term_shift = (msg_bytes % 4) * 8
    if msg_bytes % 4 == 0:
        msg = msg.at[term_word].set(jnp.uint32(0x80))
    else:
        msg = msg.at[term_word].set(msg[term_word] | jnp.uint32(0x80 << term_shift))
    be = byteswap32(msg)
    # bit length, big-endian u64 in last two BE words
    bitlen = msg_bytes * 8
    be = be.at[total_words - 2].set(jnp.uint32(bitlen >> 32))
    be = be.at[total_words - 1].set(jnp.uint32(bitlen & 0xFFFFFFFF))

    state = jnp.broadcast_to(jnp.asarray(_H0)[:, None], (8, B))
    for blk in range(n_blocks):
        state = _compress(state, be[blk * 16:(blk + 1) * 16])
    return byteswap32(state)


def digest_host(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()
