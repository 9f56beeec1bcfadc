"""Device-side Fiat-Shamir: the sha256-counter PRNG evaluated on the TPU.

The prover's transcript interactions (PRNG coefficients seeded by the
evaluation-tree root — /root/reference/lib/components/CompositionPolynomial.ts:58 —
and FRI specialX drawn from each layer root — LowDegreeProver.ts:132,194) are
the only places the staged pipeline must sync device -> host mid-proof.  On
the tunnelled-TPU backend every such sync is a full round-trip, so the fused
prover derives them ON DEVICE, bit-exactly matching `HostField.prng`
(genstark_tpu/field/host.py):

    state = sha256(seed)
    v_i   = int_be(sha256(state || u64_be(i))) mod p

Verification recomputes the same values on host, so any mismatch fails the
end-to-end round-trip tests.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field import PrimeField
from ..field.limbs import int_to_limbs
from ..hash import sha256 as _sha256

_U32 = jnp.uint32


def digest_words_to_field_mont(field: PrimeField, digests: jnp.ndarray) -> jnp.ndarray:
    """Reduce 256-bit big-endian digests mod p, into Montgomery form.

    digests: uint32[8, N] word-major LE-byte words (the hash layer's digest
    convention).  Returns uint32[L, N] Montgomery elements
    == int_be(digest_bytes) % p.

    value = sum_w byteswap32(W[w]) * 2^(32*(7-w)); split into 16-bit limbs,
    then fold ceil(16/L)-sized chunks with precomputed powers:
    result = sum_j chunk_j * 2^(16*L*j) (mod p), each product via one
    mont_mul against D_j = 2^(16*L*j) * R^2 mod p (chunk_j < 2^(16L) is a
    legal mont_mul operand: the REDC output stays < 2p — field/device.py).
    """
    dev = field.device
    L = dev.L
    n = digests.shape[1]
    v32 = _sha256.byteswap32(digests[::-1])             # [8, N], 32-bit LE limbs
    lo = (v32 & jnp.uint32(0xFFFF))
    hi = (v32 >> jnp.uint32(16))
    u16 = jnp.stack([lo, hi], axis=1).reshape(16, n)    # [16, N] limb-major
    n_chunks = -(-16 // L)
    if 16 % L:
        pad = jnp.zeros((n_chunks * L - 16, n), dtype=_U32)
        u16 = jnp.concatenate([u16, pad], axis=0)
    acc = None
    for j in range(n_chunks):
        chunk = u16[j * L:(j + 1) * L]                  # [L, N], < 2^(16L)
        d_j = (pow(2, 16 * L * j, field.modulus) * field.params.R2_mod) % field.modulus
        d_limbs = jnp.asarray(int_to_limbs(d_j, L)).reshape(L, 1)
        term = dev.mont_mul(chunk, d_limbs)
        acc = term if acc is None else dev._add(acc, term)
    return acc


def prng_elements_dev(field: PrimeField, seed_words: jnp.ndarray,
                      count: int) -> jnp.ndarray:
    """field.prng(seed, count) on device.

    seed_words: uint32[W] LE-byte words of the seed (a 32-byte root digest).
    Returns uint32[L, count] Montgomery field elements.
    """
    seed_bytes = seed_words.shape[0] * 4
    state = _sha256.digest_rows_le(seed_words[:, None], seed_bytes)   # [8, 1]
    idx = jax.lax.iota(_U32, count)
    # u64_be(i): 8 bytes, high 4 are zero for i < 2^32; as LE-byte words the
    # first word is 0 and the second is byteswap32(i).
    msgs = jnp.concatenate([
        jnp.broadcast_to(state, (8, count)),
        jnp.zeros((1, count), dtype=_U32),
        _sha256.byteswap32(idx)[None, :],
    ], axis=0)                                                        # [10, count]
    digests = _sha256.digest_rows_le(msgs, 40)                        # [8, count]
    return digest_words_to_field_mont(field, digests)


def prng_single_dev(field: PrimeField, seed_words: jnp.ndarray) -> jnp.ndarray:
    """field.prng(seed) on device -> [L, 1] Montgomery scalar."""
    return prng_elements_dev(field, seed_words, 1)


def root_words(flat_tree: jnp.ndarray, n_leaves: int) -> jnp.ndarray:
    """Root digest [8] of a device Merkle tree in the word-major
    fixed-window layout (genstark_tpu/merkle)."""
    from ..merkle import _level_offset
    depth = n_leaves.bit_length() - 1
    return jax.lax.dynamic_slice(flat_tree, (0, _level_offset(n_leaves, depth)),
                                 (8, 1))[:, 0]
