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
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..hash import Hash, digests_to_bytes


@lru_cache(maxsize=None)
def _tree_builder(algorithm: str, n: int):
    """One jitted program computing ALL tree levels into a fixed-window flat
    buffer: rows [0, n) are the leaves; level k >= 1 occupies a full n/2-row
    window at offset n + (k-1)*(n/2) of which the first n/2^k rows are valid
    (the rest is don't-care overhang from hashing a fixed-size window each
    iteration).  The loop body is shape-invariant, so the whole tree is ONE
    small program regardless of depth — program size and dispatch count are
    the dominant costs on the tunnelled-TPU backend.  The buffer STAYS on
    device; the host pulls only the 32-byte root eagerly and gathers proof
    nodes on demand."""
    h = Hash(algorithm)
    return jax.jit(lambda leaves: build_tree_flat(h, leaves, n))


def build_tree_flat(h: "Hash", leaves: jnp.ndarray, n: int) -> jnp.ndarray:
    """Traceable all-levels tree build (fixed-window layout, see
    _tree_builder).  Inlined by the fused prover (protocol/fused.py).

    Layout is WORD-MAJOR [8, rows] (digest words in sublanes, tree rows in
    lanes): a [rows, 8] minor dimension is tile-padded 16x on TPU, which
    alone would exceed HBM for the evaluation tree of a 2^24-point domain.

    Hybrid schedule: the top U levels (which hold ~94% of the hash work)
    run unrolled at their true sizes; the remaining levels run as a
    fori_loop over a fixed n/2^U-row window.  Total work ~1.5n compressions
    (vs n for a fully size-exact build and depth*n/2 for a fully windowed
    one) while the program stays ~U+1 compression bodies, and the flat
    layout is ~2n rows (the naive all-window layout is 13n+ at depth 24)."""
    depth = n.bit_length() - 1
    if depth == 0:
        return leaves
    out = jnp.zeros((8, tree_row_count(n)), dtype=jnp.uint32)
    out = jax.lax.dynamic_update_slice(out, leaves, (0, 0))

    U = min(_exact_levels(), depth)
    cur = leaves
    for k in range(1, U + 1):
        cur = h.hash_pairs(cur)               # [8, n/2^k], exact size
        out = jax.lax.dynamic_update_slice(out, cur, (0, _level_offset(n, k)))

    if depth > U:
        window = n >> (U + 1)
        base = _level_offset(n, U + 1)

        def body(i, carry):                   # builds level U+1+i
            out, cur = carry                  # cur: [8, n/2^U] window
            digests = h.hash_pairs(cur)       # [8, n/2^(U+1)] (prefix valid)
            out = jax.lax.dynamic_update_slice(out, digests,
                                               (0, base + i * window))
            cur = jax.lax.dynamic_update_slice(cur, digests, (0, 0))
            return out, cur

        out, _ = jax.lax.fori_loop(0, depth - U, body, (out, cur))
    return out


_EXACT_LEVELS = 7    # levels built at exact size (the hybrid schedule's U)


@lru_cache(maxsize=None)
def _exact_levels() -> int:
    """The hybrid schedule's U, per backend: 7 on TPU (the top 7 levels
    hold ~99.2% of the hash work; at U=4 the fixed-window tail re-hashed
    ~10x the true remaining rows — measured 44 ms of `while` time on the
    2^24-leaf evaluation tree alone);
    1 on CPU, where tests are COMPILE-bound and every exact level is one
    more unrolled compression graph per tree (the windowed tail re-hashes a
    fixed n/4 window per level, which only costs negligible toy-size
    runtime).  Proof bytes are unaffected: U changes which rows of the
    internal flat buffer hold each level, and _level_offset uses the same U
    as the build within a process, so every fetched node value is
    identical."""
    import os
    v = os.environ.get("GENSTARK_EXACT_LEVELS")
    if v is not None:
        try:
            return int(v)
        except ValueError:
            import warnings
            warnings.warn(f"GENSTARK_EXACT_LEVELS={v!r} is not an int; "
                          "using the backend default")
    import jax
    return _EXACT_LEVELS if jax.default_backend() == "tpu" else 1


def _level_window(n: int, level: int) -> int:
    """Row window reserved for `level` in the hybrid flat layout: exact size
    for the top U levels, fixed n/2^(U+1) for the rest."""
    U = min(_exact_levels(), n.bit_length() - 1)
    return n >> level if level <= U else n >> (U + 1)


def _level_offset(n: int, level: int) -> int:
    """Row offset of `level` in the hybrid flat layout."""
    U = min(_exact_levels(), n.bit_length() - 1)
    exact = min(level, U + 1)
    off = (2 * n - (n >> (exact - 1))) if exact else 0   # sum of n>>j, j<exact
    return off + max(0, level - U - 1) * (n >> (U + 1))


def tree_row_count(n: int) -> int:
    """Total rows of the hybrid flat layout for n leaves."""
    depth = n.bit_length() - 1
    return _level_offset(n, depth) + _level_window(n, depth)


def plan_batch(positions: Sequence[int], depth: int):
    """Proof schedule for `prove_batch`, separated from fetching so callers
    can batch digest gathers across many trees (one device round-trip total —
    see protocol/fused.py).  Returns (emissions, coords): emissions are
    (column, level, sibling_idx) triples in emission order; coords is the
    full fetch list [(0, p) for each position] + [(level, sib) ...]."""
    assert len(set(positions)) == len(positions), "positions must be unique"
    emissions: List[tuple] = []      # (ci, level, sibling_idx)
    available = set(positions)
    for level in range(depth):
        done = set()
        parents = set()
        for ci, p in enumerate(positions):
            idx = p >> level
            if idx in done or (idx ^ 1) in done:
                continue
            done.add(idx)
            sib = idx ^ 1
            if sib not in available:
                emissions.append((ci, level, sib))
            parents.add(idx >> 1)
        available = parents
    coords = [(0, p) for p in positions] + [(lvl, sib) for _, lvl, sib in emissions]
    return emissions, coords


def assemble_batch(positions: Sequence[int], depth: int, emissions,
                   fetched: List[bytes]) -> BatchMerkleProof:
    """Build the proof object from `plan_batch`'s schedule and the fetched
    digests (in coords order)."""
    values = fetched[:len(positions)]
    columns: List[List[bytes]] = [[] for _ in positions]
    for (ci, _, _), val in zip(emissions, fetched[len(positions):]):
        columns[ci].append(val)
    return BatchMerkleProof(values=values, nodes=columns, depth=depth)


@jax.jit
def _gather_rows(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(flat, idx, axis=1)          # word-major: rows in lanes


@dataclass
class BatchMerkleProof:
    """values[i] belongs to positions[i] (caller order); nodes[i] is the
    column of sibling digests consumed by position i's authentication walk."""
    values: List[bytes]
    nodes: List[List[bytes]]
    depth: int


class MerkleTree:
    def __init__(self, hash_: Hash, depth: int, levels: Optional[List] = None,
                 flat_dev: Optional[jnp.ndarray] = None, root: Optional[bytes] = None):
        self.hash = hash_
        self.depth = depth
        self._levels = levels            # host mode: levels[0]=leaves ... [root]
        self._flat = flat_dev            # device mode: concatenated levels
        self._root = root

    @property
    def root(self) -> bytes:
        if self._root is None:
            self._root = self._levels[-1][0]
        return self._root

    @property
    def leaf_count(self) -> int:
        return 1 << self.depth

    @classmethod
    def create(cls, leaves: jnp.ndarray, hash_: Hash) -> "MerkleTree":
        """leaves: uint32[8, N] word-major LE-word digests on device (N a
        power of 2).  The tree stays device-resident; only the root is
        transferred."""
        n = int(leaves.shape[1])
        assert n & (n - 1) == 0 and n >= 1, "leaf count must be a power of 2"
        flat = _tree_builder(hash_.algorithm, n)(leaves)
        depth = n.bit_length() - 1
        root = np.asarray(flat[:, _level_offset(n, depth)]).astype("<u4").tobytes()
        return cls(hash_, depth, flat_dev=flat, root=root)

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
        return cls(hash_, n.bit_length() - 1, levels=levels)

    def _fetch_nodes(self, coords: Sequence[tuple]) -> List[bytes]:
        """Digests at [(level, idx), ...] — one device gather in device mode."""
        if not coords:
            return []
        if self._flat is not None:
            n = self.leaf_count
            offsets = [_level_offset(n, level) + idx for level, idx in coords]
            rows = np.asarray(_gather_rows(
                self._flat, jnp.asarray(offsets, dtype=jnp.int32))).astype("<u4").T
            return [rows[i].tobytes() for i in range(rows.shape[0])]
        return [self._levels[level][idx] for level, idx in coords]

    def prove_batch(self, positions: Sequence[int]) -> BatchMerkleProof:
        """Batched authentication paths, level-synchronized ("octopus").

        Per level, each queried subtree pair is processed once (in caller
        order); a sibling hash is emitted — into the column of the position
        that first reaches the pair — only when the verifier cannot compute
        it from below.  Every emitted value feeds the upward hash toward the
        single root comparison, so the proof is minimal and every byte is
        load-bearing.  `verify_batch` replays the identical schedule.

        The schedule is pure index bookkeeping; all digests are fetched in
        two batched device gathers (leaves + sibling nodes).
        """
        emissions, coords = plan_batch(positions, self.depth)
        fetched = self._fetch_nodes(coords)
        return assemble_batch(positions, self.depth, emissions, fetched)

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
