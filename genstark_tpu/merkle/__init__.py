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
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..hash import Hash, digests_to_bytes


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
        device_levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = hash_.hash_pairs(cur)
            device_levels.append(cur)
        levels = [digests_to_bytes(np.asarray(lv)) for lv in device_levels]
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
        """Batched authentication paths with sibling dedup.

        Walks each position bottom-up in caller order; emits a sibling digest
        only if the verifier cannot already derive it (it is not a queried
        leaf, not on an already-walked path, and not previously emitted).
        The verifier (`verify_batch`) replays the identical walk.
        """
        assert len(set(positions)) == len(positions), "positions must be unique"
        values = [self._levels[0][p] for p in positions]
        known = {(0, p) for p in positions}
        columns: List[List[bytes]] = [[] for _ in positions]
        for ci, p in enumerate(positions):
            idx = p
            for level in range(self.depth):
                parent = (level + 1, idx >> 1)
                if parent in known:
                    break
                sib = idx ^ 1
                if (level, sib) not in known:
                    columns[ci].append(self._levels[level][sib])
                    known.add((level, sib))
                known.add(parent)
                idx >>= 1
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
        depth = proof.depth
        node_values = {}
        for p, v in zip(positions, proof.values):
            if (0, p) in node_values and node_values[(0, p)] != v:
                return False
            node_values[(0, p)] = v
        known = {(0, p) for p in positions}
        try:
            for ci, p in enumerate(positions):
                col = proof.nodes[ci]
                cursor = 0
                idx = p
                for level in range(depth):
                    parent = (level + 1, idx >> 1)
                    if parent in known and parent in node_values:
                        break
                    sib = idx ^ 1
                    if (level, sib) not in known:
                        sib_val = col[cursor]
                        cursor += 1
                        node_values[(level, sib)] = sib_val
                        known.add((level, sib))
                    sv = node_values.get((level, sib))
                    mv = node_values.get((level, idx))
                    if sv is None or mv is None:
                        return False
                    left, right = (mv, sv) if idx % 2 == 0 else (sv, mv)
                    pv = hash_.digest(left + right)
                    if parent in node_values and node_values[parent] != pv:
                        return False
                    node_values[parent] = pv
                    known.add(parent)
                    idx >>= 1
        except IndexError:
            return False
        return node_values.get((depth, 0)) == root
