"""Poseidon hash control-value oracles.

Python re-derivation of the reference's example utilities
(/root/reference/examples/poseidon/utils.ts): the Poseidon permutation
(`createHash`, utils.ts:19-49), Cauchy MDS matrix (`getMdsMatrix`,
utils.ts:64-79), sha256-counter round constants (`getRoundConstants`,
utils.ts:51-62), round-control cycle (`getRoundControls`, utils.ts:95-110),
and the two Merkle-tree shapes (`MerkleTree` over 2-element values,
utils.ts:126-167; `MerkleTree2` over scalars, utils.ts:169-209).

These are independent of the AIR path: they exist to pin the semantics of
the STARK traces (a Merkle-proof STARK's final state must equal the root
computed here).
"""

from __future__ import annotations

import hashlib
from typing import Callable, List, Sequence

HADES_SEED = "Hades"


def get_round_constants(field, width: int, rounds: int) -> List[List[int]]:
    """ark[i][j] = sha256('Hades' + counter) as a field element
    (utils.ts:51-62; counter runs row-major over rounds x width)."""
    result = []
    c = 0
    for _ in range(rounds):
        row = []
        for _ in range(width):
            digest = hashlib.sha256(f"{HADES_SEED}{c}".encode()).digest()
            row.append(int.from_bytes(digest, "big") % field.p)
            c += 1
        result.append(row)
    return result


def _get_constants(field, seed: str, count: int) -> List[int]:
    return [int.from_bytes(hashlib.sha256(f"{seed}{i}".encode()).digest(),
                           "big") % field.p
            for i in range(count)]


def get_mds_matrix(field, width: int) -> List[List[int]]:
    """Cauchy matrix mds[i][j] = 1/(x_i - y_j) (utils.ts:64-79)."""
    x = _get_constants(field, "HadesMDSx", width)
    y = _get_constants(field, "HadesMDSy", width)
    if len(set(x + y)) != 2 * width:
        raise ValueError("MDS values are not all different")
    return [[field.inv(field.sub(xi, yj)) for yj in y] for xi in x]


def get_round_controls(f_rounds: int, p_rounds: int, steps: int) -> List[int]:
    """1 for full rounds, 0 for partial, padded to `steps` (utils.ts:95-110)."""
    result = [1 if (i < f_rounds // 2 or i >= f_rounds // 2 + p_rounds) else 0
              for i in range(f_rounds + p_rounds)]
    result += [0] * (steps - len(result))
    return result


def create_hash(field, exp: int, f_rounds: int, p_rounds: int, state_width: int,
                rc: Sequence[Sequence[int]] = None) -> Callable:
    """The Poseidon permutation-as-hash (utils.ts:19-49): rf/2 full rounds,
    rp partial rounds (S-box on the last state element only), rf/2 full
    rounds; each round adds ark[i], applies the S-box, multiplies by MDS.
    Returns the first two state elements."""
    m = state_width
    mds = get_mds_matrix(field, m)
    ark = rc if rc is not None else get_round_constants(field, m, f_rounds + p_rounds)

    def do_hash(inputs: Sequence[int]) -> List[int]:
        assert 0 < len(inputs) < m
        state = [v % field.p for v in inputs] + [0] * (m - len(inputs))
        for i in range(f_rounds + p_rounds):
            state = [field.add(state[j], ark[i][j]) for j in range(m)]
            if i < f_rounds // 2 or i >= f_rounds // 2 + p_rounds:
                state = [field.exp(v, exp) for v in state]
            else:
                state[m - 1] = field.exp(state[m - 1], exp)
            state = [
                sum(field.mul(mds[r][j], state[j]) for j in range(m)) % field.p
                for r in range(m)
            ]
        return state[:2]

    return do_hash


def transpose(matrix: Sequence[Sequence[int]]) -> List[List[int]]:
    return [list(row) for row in zip(*matrix)]


class MerkleTree:
    """Merkle tree over 2-element values (utils.ts:126-167)."""

    def __init__(self, values: Sequence[Sequence[int]], hash_fn: Callable):
        n = len(values)
        self.nodes = [None] * n + [list(v) for v in values]
        for i in range(n - 1, 0, -1):
            self.nodes[i] = hash_fn(self.nodes[i * 2] + self.nodes[i * 2 + 1])

    @property
    def root(self) -> List[int]:
        return self.nodes[1]

    def prove(self, index: int) -> List[List[int]]:
        index += len(self.nodes) // 2
        proof = [self.nodes[index]]
        while index > 1:
            proof.append(self.nodes[index ^ 1])
            index >>= 1
        return proof

    @staticmethod
    def verify(root: Sequence[int], index: int, proof: Sequence[Sequence[int]],
               hash_fn: Callable) -> bool:
        index += 2 ** len(proof)
        v = list(proof[0])
        for i in range(1, len(proof)):
            if index & 1:
                v = hash_fn(list(proof[i]) + v)
            else:
                v = hash_fn(v + list(proof[i]))
            index >>= 1
        return root[0] == v[0] and root[1] == v[1]


class MerkleTree2:
    """Merkle tree over scalar values; node = hash([l, r])[0] (utils.ts:169-209)."""

    def __init__(self, values: Sequence[int], hash_fn: Callable):
        n = len(values)
        self.nodes = [None] * n + list(values)
        for i in range(n - 1, 0, -1):
            self.nodes[i] = hash_fn([self.nodes[i * 2], self.nodes[i * 2 + 1]])[0]

    @property
    def root(self) -> int:
        return self.nodes[1]

    def prove(self, index: int) -> List[int]:
        index += len(self.nodes) // 2
        proof = [self.nodes[index]]
        while index > 1:
            proof.append(self.nodes[index ^ 1])
            index >>= 1
        return proof

    @staticmethod
    def verify(root: int, index: int, proof: Sequence[int], hash_fn: Callable) -> bool:
        index += 2 ** len(proof)
        v = proof[0]
        for i in range(1, len(proof)):
            v = hash_fn([proof[i], v])[0] if index & 1 else hash_fn([v, proof[i]])[0]
            index >>= 1
        return root == v


def to_binary_array(value: int, length: int) -> List[int]:
    """LSB-first bit decomposition (merkleProof.ts:160-167)."""
    return [(value >> i) & 1 for i in range(length)]
