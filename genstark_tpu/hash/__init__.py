"""Hash layer: sha256 / blake2s256, host + device-vectorized.

`create_hash(algorithm)` mirrors the reference merkle package factory
(consumed at /root/reference/lib/Stark.ts:50).  The Hash object provides the
same surface the protocol engine needs (SURVEY.md section 1, L2):

- digest(bytes) -> bytes                       (host, Fiat-Shamir-sized)
- digest_rows(words_le, msg_bytes)             (device batch, word-major:
                                                uint32[W, B] -> [8, B])
- merge_element_rows(vectors_std)              (leaf-per-index over vectors =
                                                `mergeVectorRows`)
- hash_pairs(digests)                          (one Merkle tree level)

Device digests are WORD-MAJOR uint32[8, B] (words in sublanes, batch in
lanes): a batch-major [B, 8] minor dimension is tile-padded 8-wide -> 128
lanes on TPU, a 16x HBM blowup that exceeds device memory for the Merkle
buffers at a 2^24-point evaluation domain and wastes bandwidth at every
size.  Word-major buffers tile perfectly and every compression operates on
full [B] lane vectors.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import sha256 as _sha256
from . import blake2s as _blake2s

HASH_ALGORITHMS = ("sha256", "blake2s256")


def _use_pallas_hash() -> bool:
    import os

    import jax
    if os.environ.get("GENSTARK_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def digests_to_bytes(digests: np.ndarray) -> List[bytes]:
    """uint32[8, B] word-major LE-word digests -> list of 32-byte digests."""
    arr = np.ascontiguousarray(digests.astype("<u4").T)
    raw = arr.tobytes()
    return [raw[i * 32:(i + 1) * 32] for i in range(arr.shape[0])]


def bytes_to_words_le(data: bytes) -> np.ndarray:
    """bytes -> uint32 LE-byte words (zero-padded to word boundary)."""
    pad = (-len(data)) % 4
    return np.frombuffer(data + b"\x00" * pad, dtype="<u4").astype(np.uint32)


def elements_to_words(limbs: jnp.ndarray) -> jnp.ndarray:
    """Standard-form 16-bit limb array [L, N] -> LE-byte words [L/2, N]
    (word-major — no transpose, limb pairs combine in place).

    Element byte layout is little-endian (reference wire format), so word k
    of element j is limbs[2k, j] | limbs[2k+1, j] << 16.
    """
    L = limbs.shape[0]
    assert L % 2 == 0
    lo = limbs[0::2]
    hi = limbs[1::2]
    return lo | (hi << np.uint32(16))           # [L/2, N]


class Hash:
    def __init__(self, algorithm: str):
        if algorithm not in HASH_ALGORITHMS:
            raise ValueError(f"Hash algorithm {algorithm} is not supported")
        self.algorithm = algorithm
        self._mod = _sha256 if algorithm == "sha256" else _blake2s
        self.digest_size = 32
        self.is_optimized = True

    # ----- host path --------------------------------------------------------
    def digest(self, data: bytes) -> bytes:
        return self._mod.digest_host(data)

    # ----- device batch paths ----------------------------------------------
    def digest_rows(self, words_le: jnp.ndarray, msg_bytes: int) -> jnp.ndarray:
        """Hash B equal-size messages: uint32[W, B] LE words -> [8, B].

        On real TPUs large batches take the Pallas kernel (all rounds
        unrolled over in-register word vectors — hash/pallas_hash.py);
        elsewhere the fori_loop jnp compressors (small compiled programs,
        shard_map-compatible)."""
        if _use_pallas_hash():
            from . import pallas_hash
            batch = words_le.shape[1]
            if pallas_hash.supported(batch):
                return pallas_hash.digest_rows_le(words_le, msg_bytes,
                                                  self.algorithm)
        return self._mod.digest_rows_le(words_le, msg_bytes)

    def merge_element_rows(self, vectors_std: Sequence[jnp.ndarray],
                           element_size: int) -> jnp.ndarray:
        """Leaf hashing across vectors: leaf_i = H(v0[i] || v1[i] || ...).

        vectors_std: list of standard-form limb arrays [L, N]; returns
        word-major digests [8, N].
        Equivalent of merkle `mergeVectorRows` (/root/reference/lib/Stark.ts:115).
        """
        if _use_pallas_hash():
            from . import pallas_hash
            batch = vectors_std[0].shape[1]
            if pallas_hash.supported(batch) and vectors_std[0].shape[0] >= 8:
                # word build fused in-kernel: the serialized leaf buffer
                # (a full copy of every committed vector) never exists
                return pallas_hash.digest_limb_rows(
                    list(vectors_std), element_size, self.algorithm)
        words = jnp.concatenate([elements_to_words(v) for v in vectors_std], axis=0)
        return self.digest_rows(words, element_size * len(vectors_std))

    def digest_stride_rows(self, values_std: jnp.ndarray, element_size: int) -> jnp.ndarray:
        """FRI row hashing: values [L, N] -> rows r = [v[r], v[r+M], v[r+2M],
        v[r+3M]] with M = N/4, hash each 4-element row -> [8, M].

        Equivalent of `digestValues(matrix.toBuffer(), 4*elementSize)` on the
        stride-transposed matrix (/root/reference/lib/components/LowDegreeProver.ts:42-45).
        """
        L, N = values_std.shape
        M = N // 4
        if _use_pallas_hash():
            from . import pallas_hash
            if pallas_hash.supported(M) and L >= 8:
                # quarter slices expressed as block-index-mapped views of
                # the ONE input — no strided-slice materialization
                return pallas_hash.digest_stride4_rows(
                    values_std, element_size, self.algorithm)
        cols = [elements_to_words(values_std[:, k * M:(k + 1) * M]) for k in range(4)]
        words = jnp.concatenate(cols, axis=0)   # [4*L/2, M]
        return self.digest_rows(words, element_size * 4)

    def hash_pairs(self, digests: jnp.ndarray) -> jnp.ndarray:
        """One Merkle level: uint32[8, 2N] -> uint32[8, N] (word-major).

        Pair k = leaves 2k (left) and 2k+1 (right): split even/odd lanes via
        stride-2 lane slices and stack left over right as a 16-word message.

        Rejected alternatives (measured on v5e): a [8, N, 2] -> [2, 8, N]
        reshape+transpose looks 2x faster standalone (18 vs 34 ms at 2^24)
        but XLA implements it through a 16x tile-padded intermediate
        (minor dim 2 padded to a full tile) — 16 GB at N = 2^24, which
        OOMs the 2^21-step proof; Mosaic rejects both lane-strided slices
        and sub-lane reshapes in-kernel, so the de-interleave cannot ride
        the hash kernel either.  The strided slices stay word-major with
        no padded temps."""
        n2 = digests.shape[1]
        n = n2 // 2
        left = jax.lax.slice(digests, (0, 0), (8, n2 - 1), (1, 2))
        right = jax.lax.slice(digests, (0, 1), (8, n2), (1, 2))
        pairs = jnp.concatenate([left, right], axis=0)             # [16, N]
        return self.digest_rows(pairs, 64)


def create_hash(algorithm: str) -> Hash:
    return Hash(algorithm)
