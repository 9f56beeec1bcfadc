"""Device-side Fiat-Shamir query sampling + batch-Merkle proof planning.

The last host sync inside a proof is the roots fetch: query positions
(protocol/queries.py — the reference's QueryIndexGenerator.ts:32-68
rejection sampler, including the Node hex-encoding quirk) and the batch
Merkle proof schedules (merkle.plan_batch) are host code, so the prover
pays dispatch -> fetch roots -> host sample -> dispatch gather -> fetch.
On the tunnelled backend that mid-proof round-trip is ~30-55 ms — larger
than the device compute at the reference's primary 2^13 benchmark config.

This module re-derives both ON DEVICE as fixed-shape traced code, so the
whole proof runs as dispatch(es) + ONE fetch:

- `sample_indexes_dev`: the sha256 rejection sampler, bit-exact with
  `queries.get_pseudorandom_indexes` including the Node
  `Buffer.from(x.toString(16), 'hex')` odd-nibble drop: candidate i hashes
  the ASCII-free hex *bytes* of (state + i) — leading zeros stripped,
  trailing odd nibble dropped — which this code reproduces with dynamic
  per-candidate byte alignment into one SHA-256 block.
- `augment_stark_dev` / `augment_fri_dev`: the two insertion-ordered
  dedup augmentations (Stark.ts:274-282, LowDegreeProver.ts:302-309).
- `plan_rows_dev`: merkle.plan_batch's emission schedule as a traced
  computation (levels ascending, positions in caller order, sibling
  emitted unless present in the level's index set).

Every output is padded to the caller's structural caps; the host
re-derives positions/plans from the fetched roots afterwards (cheap) to
assemble the proof bytes, and any device/host disagreement (e.g. the
astronomically-unlikely hex-length corner the vectorized sampler does not
model, or candidate exhaustion) is detected by comparing the fetched
positions and falls back to the host two-dispatch path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..hash import sha256 as _sha256

_U32 = jnp.uint32


def _sha256_block(block_be: jnp.ndarray) -> jnp.ndarray:
    """One-block SHA-256: block_be uint32[16, B] big-endian words ->
    digest uint32[8, B] big-endian words (no final byteswap)."""
    B = block_be.shape[1]
    state = jnp.broadcast_to(jnp.asarray(_sha256._H0)[:, None], (8, B))
    return _sha256._compress(state, block_be)


def sample_indexes_dev(seed_words: jnp.ndarray, count: int, max_: int,
                       exclude_multiples_of: int, n_cand: int):
    """Vectorized `get_pseudorandom_indexes(seed, count, max_, excl)`.

    seed_words: uint32[8] LE-byte words of the 32-byte seed digest (the
    root convention used throughout the fused prover).  max_ and
    exclude_multiples_of must be powers of two (domain sizes / extension
    factors always are).  Evaluates candidates i = 0..n_cand-1 (the host
    loop's first n_cand iterations) and returns
    (idx int32[count] zero-padded, found int32 scalar).

    found < count means the candidate window was exhausted — callers must
    fall back to the host sampler (which scans count*1000 iterations)."""
    assert max_ & (max_ - 1) == 0 and max_.bit_length() <= 33
    assert exclude_multiples_of == 0 or \
        exclude_multiples_of & (exclude_multiples_of - 1) == 0

    # state = int_be(sha256(seed_bytes)), as 8 BE u32 words [w0 most
    # significant]: digest_rows_le returns LE-word digests, so byteswap and
    # keep word order (digest byte 0 is the most significant of int_be).
    st = _sha256.byteswap32(_sha256.digest_rows_le(
        seed_words[:, None], 32))[:, 0]                 # [8] BE words

    # v_i = state + i, BE words [9, n] (word 0 = 2^256 overflow).  u64 is
    # unavailable (x64 off) — carries via u32 wraparound compare.
    i_vec = jax.lax.iota(_U32, n_cand)
    words = [jnp.broadcast_to(st[w], (n_cand,)) for w in range(8)]
    s = words[7] + i_vec
    carry = (s < i_vec).astype(_U32)
    words[7] = s
    for w in range(6, -1, -1):
        s = words[w] + carry
        carry = (s < carry).astype(_U32)
        words[w] = s
    v = jnp.stack([carry] + words)                      # [9, n] BE words

    # significant nibble count k of v (hex length before the parity drop)
    nz = v != 0
    top = jnp.argmax(nz, axis=0)                        # first nonzero word
    any_nz = jnp.any(nz, axis=0)
    top_w = jnp.take_along_axis(v, top[None, :], axis=0)[0]
    # bit length of the top word (1..32); fls via 31 - clz
    bl = np.uint32(32) - jax.lax.clz(jnp.maximum(top_w, np.uint32(1)))
    k = jnp.where(any_nz,
                  ((bl + np.uint32(3)) >> np.uint32(2)).astype(jnp.int32)
                  + (np.int32(8) - top.astype(jnp.int32)) * np.int32(8),
                  np.int32(0))                          # nibbles of v

    # w_val = v >> 4 when k is odd (drop the trailing nibble)
    odd = (k & 1).astype(jnp.bool_)
    v_lo = jnp.concatenate(
        [jnp.zeros((1, n_cand), dtype=_U32), v[:-1]], axis=0)
    v_shift4 = (v >> np.uint32(4)) | (v_lo << np.uint32(28))
    wv = jnp.where(odd[None, :], v_shift4, v)           # [9, n] BE words
    ell = (k >> 1).astype(jnp.int32)                    # message bytes <= 32

    # Message assembly: wv's 9 BE words form a 36-byte field X[0..35]
    # (leading zeros included); wv's ell significant bytes are X[36-ell..35]
    # and X[36] holds the 0x80 terminator, so message byte b (0..ell) is
    # X[b + (36 - ell)] — one dynamic gather per candidate column.
    b36 = []
    for wrd in range(9):
        for byt in range(4):
            b36.append((wv[wrd] >> np.uint32(8 * (3 - byt))) & np.uint32(0xFF))
    b36.append(jnp.full((n_cand,), 0x80, dtype=_U32))   # X[36] terminator
    X = jnp.stack(b36)                                  # [37, n]
    # message M[b] = X[b + s] for b <= ell else 0, with s = 36 - ell
    s_off = (np.int32(36) - ell)[None, :]               # [1, n]
    b_idx = jax.lax.iota(jnp.int32, 34)[:, None]        # need bytes 0..ell<=32, +0x80
    gidx = jnp.clip(b_idx + s_off, 0, 36)
    M = jnp.take_along_axis(X, gidx, axis=0)            # [34, n]
    M = jnp.where(b_idx <= ell[None, :], M, np.uint32(0))

    # SHA-256 block: words 0..8 from M's 34 bytes (byte 35 unused: ell<=32
    # so terminator lands at byte <= 32), word 15 = bit length
    blk = []
    for j in range(9):
        by = [M[4 * j + t] if 4 * j + t < 34 else jnp.zeros_like(M[0])
              for t in range(4)]
        blk.append((by[0] << np.uint32(24)) | (by[1] << np.uint32(16)) |
                   (by[2] << np.uint32(8)) | by[3])
    for j in range(9, 15):
        blk.append(jnp.zeros((n_cand,), dtype=_U32))
    blk.append((ell * np.int32(8)).astype(_U32))        # bitlen < 2^32
    digest = _sha256_block(jnp.stack(blk))              # [8, n] BE words

    # index = digest mod max_ (a power of two < 2^32: low bits of word 7)
    cand = (digest[7] & np.uint32(max_ - 1)).astype(jnp.int32)   # [n]

    valid = jnp.ones((n_cand,), dtype=jnp.bool_)
    if exclude_multiples_of:
        valid = (cand & np.int32(exclude_multiples_of - 1)) != 0

    # first-occurrence (insertion order) dedup: candidate i survives iff no
    # valid j < i produced the same index
    eq = cand[None, :] == cand[:, None]                 # [n, n]
    earlier = (jax.lax.iota(jnp.int32, n_cand)[:, None] >
               jax.lax.iota(jnp.int32, n_cand)[None, :])
    dup = jnp.any(eq & earlier & valid[None, :], axis=1)
    keep = valid & ~dup
    order = jnp.cumsum(keep.astype(jnp.int32)) - 1      # output slot
    take = keep & (order < count)
    found = jnp.sum(take.astype(jnp.int32))
    dest = jnp.where(take, order, count)                # dropped -> pad slot
    out = jnp.zeros((count + 1,), dtype=jnp.int32).at[dest].set(
        cand, mode="drop")
    return out[:count], found


def _dedup_ordered(cand: jnp.ndarray, cap: int):
    """First-occurrence ordered dedup of cand int32[n] -> (out int32[cap]
    zero-padded, found)."""
    n = cand.shape[0]
    eq = cand[None, :] == cand[:, None]
    earlier = (jax.lax.iota(jnp.int32, n)[:, None] >
               jax.lax.iota(jnp.int32, n)[None, :])
    dup = jnp.any(eq & earlier, axis=1)
    keep = ~dup
    order = jnp.cumsum(keep.astype(jnp.int32)) - 1
    found = jnp.sum(keep.astype(jnp.int32))
    dest = jnp.where(keep, order, cap)
    out = jnp.zeros((cap + 1,), dtype=jnp.int32).at[dest].set(
        cand, mode="drop")
    return out[:cap], found


def augment_stark(positions: jnp.ndarray, ext: int, domain_size: int):
    """Stark._get_augmented_positions: p then (p+ext) mod N per p,
    insertion-ordered dedup.  positions int32[C] -> (int32[2C], found)."""
    C = positions.shape[0]
    nxt = (positions + np.int32(ext)) & np.int32(domain_size - 1)
    inter = jnp.stack([positions, nxt], axis=1).reshape(2 * C)
    return _dedup_ordered(inter, 2 * C)


def augment_fri(positions: jnp.ndarray, column_length: int):
    """fri.get_augmented_positions: p mod rowLength, insertion-ordered
    dedup.  positions int32[C] -> (int32[C], found)."""
    row_length = column_length // 4
    return _dedup_ordered(positions & np.int32(row_length - 1),
                          positions.shape[0])


def plan_rows_dev(positions: jnp.ndarray, n_pos, depth: int, n_leaves: int,
                  row_cap: int, level_offset):
    """merkle.plan_batch's fetch-row list as traced code.

    positions int32[Cp] (slots >= n_pos are padding), n_pos traced or
    static count, depth levels.  Returns (rows int32[row_cap] zero-padded,
    n_rows) where rows = [level_offset(0) + p for the n_pos positions] ++
    [level_offset(lvl) + sibling for each emission in plan_batch order
    (levels ascending, caller position order within a level)].

    Emission rule (merkle/__init__.py plan_batch): at each level a
    position's node is processed once (skip if its index or its sibling
    index was already processed this level by an EARLIER position); the
    sibling is emitted unless some position's level-index equals it."""
    Cp = positions.shape[0]
    ci = jax.lax.iota(jnp.int32, Cp)
    live = ci < n_pos
    flags = []
    coords = []
    for level in range(depth):
        idx = positions >> np.int32(level)
        sib = idx ^ np.int32(1)
        # done-check: idx[i] (dup) or sib[i] processed by an earlier live
        # position this level (testing against ALL earlier live idx values
        # is equivalent — a skipped earlier duplicate equals a processed
        # even-earlier one)
        eq = idx[None, :] == idx[:, None]                # idx[j] == idx[i]
        earlier = (ci[:, None] > ci[None, :]) & live[None, :]
        seen = jnp.any((eq | (idx[None, :] == sib[:, None])) & earlier,
                       axis=1)
        first = live & ~seen
        # sibling present among ANY live position's level-index?
        sib_present = jnp.any((idx[None, :] == sib[:, None]) & live[None, :],
                              axis=1)
        emit = first & ~sib_present
        flags.append(emit)
        coords.append(np.int32(level_offset(n_leaves, level)) + sib)
    emit_flat = jnp.concatenate(flags)                   # [depth*Cp]
    coord_flat = jnp.concatenate(coords)
    # leading section: the position leaf rows themselves
    lead_coord = np.int32(level_offset(n_leaves, 0)) + positions
    lead_keep = live
    all_keep = jnp.concatenate([lead_keep, emit_flat])
    all_coord = jnp.concatenate([lead_coord, coord_flat])
    order = jnp.cumsum(all_keep.astype(jnp.int32)) - 1
    n_rows = jnp.sum(all_keep.astype(jnp.int32))
    dest = jnp.where(all_keep & (order < row_cap), order, row_cap)
    rows = jnp.zeros((row_cap + 1,), dtype=jnp.int32).at[dest].set(
        all_coord, mode="drop")
    return rows[:row_cap], n_rows
