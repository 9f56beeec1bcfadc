"""Merkle commitment layer (L2 of SURVEY.md's layer map).

TPU-native equivalent of `@guildofweavers/merkle` as consumed by the
reference (`MerkleTree.create`, `proveBatch`, `verifyBatch` — call sites at
/root/reference/lib/Stark.ts:118,150,206 and
/root/reference/lib/components/LowDegreeProver.ts:46,86,109,116,163-164).

Tree levels are built on device as log2(N) batched 2-to-1 hash rounds; proof
construction / verification are host logic over the pulled-back digest levels.

BatchMerkleProof wire shape matches the reference serializer exactly
(/root/reference/lib/utils/serialization.ts:18-127): `values[i]` corresponds
to `positions[i]` in caller order, `nodes` is a matrix of per-position sibling
columns, `depth` is the tree depth.  The sibling-dedup algorithm (which
sibling hashes are included vs recomputed) is our own deterministic scheme —
the reference package's internal choice is not observable from this repo —
but the byte format round-trips through the same codec.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..hash import Hash, digests_to_bytes


@lru_cache(maxsize=None)
def _tree_builder(algorithm: str, n: int):
    """One jitted program computing ALL tree levels (concatenated leaves-first)
    so the host pulls the finished tree in a single transfer — per-level
    round trips dominated prover time on the tunneled TPU."""
    h = Hash(algorithm)

    def build(leaves):
        levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = h.hash_pairs(cur)
            levels.append(cur)
        return jnp.concatenate(levels, axis=0)

    return jax.jit(build)


class _NpLevel:
    """Zero-copy view of one tree level; rows surface as 32-byte digests."""

    __slots__ = ("arr",)

    def __init__(self, arr: np.ndarray):
        self.arr = np.ascontiguousarray(arr).astype("<u4", copy=False)

    def __getitem__(self, i: int) -> bytes:
        return self.arr[i].tobytes()

    def __len__(self) -> int:
        return self.arr.shape[0]


@dataclass
class BatchMerkleProof:
    """values[i] belongs to positions[i] (caller order); nodes[i] is the
    column of sibling digests consumed by position i's authentication walk."""
    values: List[bytes]
    nodes: List[List[bytes]]
    depth: int


class MerkleTree:
    def __init__(self, levels: List[List[bytes]], hash_: Hash):
        self._levels = levels            # levels[0] = leaves ... levels[depth] = [root]
        self.hash = hash_
        self.depth = len(levels) - 1

    @property
    def root(self) -> bytes:
        return self._levels[-1][0]

    @property
    def leaf_count(self) -> int:
        return len(self._levels[0])

    @classmethod
    def create(cls, leaves: jnp.ndarray, hash_: Hash) -> "MerkleTree":
        """leaves: uint32[N, 8] LE-word digests on device (N a power of 2)."""
        n = int(leaves.shape[0])
        assert n & (n - 1) == 0 and n >= 1, "leaf count must be a power of 2"
        flat = np.asarray(_tree_builder(hash_.algorithm, n)(leaves))
        levels = []
        offset = 0
        size = n
        while size >= 1:
            levels.append(_NpLevel(flat[offset:offset + size]))
            offset += size
            if size == 1:
                break
            size //= 2
        return cls(levels, hash_)

    @classmethod
    def create_from_bytes(cls, leaves: Sequence[bytes], hash_: Hash) -> "MerkleTree":
        """Host-side build for small trees (e.g. FRI remainder re-commit)."""
        n = len(leaves)
        assert n & (n - 1) == 0 and n >= 1
        levels = [list(leaves)]
        cur = list(leaves)
        while len(cur) > 1:
            cur = [hash_.digest(cur[2 * i] + cur[2 * i + 1]) for i in range(len(cur) // 2)]
            levels.append(cur)
        return cls(levels, hash_)

    def prove_batch(self, positions: Sequence[int]) -> BatchMerkleProof:
        """Batched authentication paths, level-synchronized ("octopus").

        Per level, each queried subtree pair is processed once (in caller
        order); a sibling hash is emitted — into the column of the position
        that first reaches the pair — only when the verifier cannot compute
        it from below.  Every emitted value feeds the upward hash toward the
        single root comparison, so the proof is minimal and every byte is
        load-bearing.  `verify_batch` replays the identical schedule.
        """
        assert len(set(positions)) == len(positions), "positions must be unique"
        values = [self._levels[0][p] for p in positions]
        columns: List[List[bytes]] = [[] for _ in positions]
        level_vals = {p: self._levels[0][p] for p in positions}
        for level in range(self.depth):
            done = set()
            parents = {}
            for ci, p in enumerate(positions):
                idx = p >> level
                if idx in done or (idx ^ 1) in done:
                    continue
                done.add(idx)
                sib = idx ^ 1
                if sib not in level_vals:
                    sib_val = self._levels[level][sib]
                    columns[ci].append(sib_val)
                    level_vals[sib] = sib_val
                a, b = level_vals[idx], level_vals[sib]
                left, right = (a, b) if idx % 2 == 0 else (b, a)
                parents[idx >> 1] = self.hash.digest(left + right)
            level_vals = parents
        return BatchMerkleProof(values=values, nodes=columns, depth=self.depth)

    @staticmethod
    def verify_batch(root: bytes, positions: Sequence[int],
                     proof: BatchMerkleProof, hash_: Hash) -> bool:
        """Verify a batched proof.  proof.values must already be leaf digests
        (the protocol rehashes raw leaf bytes first, mirroring
        `rehashMerkleProofValues` at /root/reference/lib/utils/index.ts:34-45)."""
        if len(positions) != len(proof.values):
            return False
        if len(set(positions)) != len(positions):
            return False
        if len(proof.nodes) != len(positions):
            return False
        depth = proof.depth
        level_vals = {}
        for p, v in zip(positions, proof.values):
            if not (0 <= p < (1 << depth)):
                return False
            level_vals[p] = v
        cursors = [0] * len(positions)
        for level in range(depth):
            done = set()
            parents = {}
            for ci, p in enumerate(positions):
                idx = p >> level
                if idx in done or (idx ^ 1) in done:
                    continue
                done.add(idx)
                sib = idx ^ 1
                if sib not in level_vals:
                    col = proof.nodes[ci]
                    if cursors[ci] >= len(col):
                        return False
                    level_vals[sib] = col[cursors[ci]]
                    cursors[ci] += 1
                a = level_vals.get(idx)
                if a is None:
                    return False
                b = level_vals[sib]
                left, right = (a, b) if idx % 2 == 0 else (b, a)
                parents[idx >> 1] = hash_.digest(left + right)
            level_vals = parents
        for ci, col in enumerate(proof.nodes):
            if cursors[ci] != len(col):
                return False                      # trailing unconsumed nodes
        return level_vals.get(0) == root
