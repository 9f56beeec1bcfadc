"""Rescue hash control-value oracle.

Python re-derivation of /root/reference/examples/rescue/utils.ts: the Rescue
block cipher with unrolled key schedule (`Rescue.unrollConstants`
utils.ts:131-165, `groupConstants` utils.ts:167-186), the two sponge modes
(`sponge` utils.ts:50-88, `modifiedSponge` utils.ts:90-127), and the scalar
Merkle tree (utils.ts:232-273).
"""

from __future__ import annotations

from typing import Callable, List, Sequence


class Rescue:
    def __init__(self, field, alpha: int, inv_alpha: int, registers: int,
                 rounds: int, mds: Sequence[Sequence[int]],
                 constants: Sequence[int]):
        self.f = field
        self.alpha = alpha
        self.inv_alpha = inv_alpha          # may be negative (TS uses -inv)
        self.registers = registers
        self.rounds = rounds
        self.mds = [list(r) for r in mds]
        c = list(constants)
        m = registers
        self.i_constants = [c.pop(0) for _ in range(m)]
        self.c_matrix = [[c.pop(0) for _ in range(m)] for _ in range(m)]
        self.c_constants = [c.pop(0) for _ in range(m)]

    # --- helpers -----------------------------------------------------------
    def _vadd(self, a, b):
        return [self.f.add(x, y) for x, y in zip(a, b)]

    def _mmul(self, mat, v):
        return [sum(self.f.mul(mat[i][j], v[j]) for j in range(len(v))) % self.f.p
                for i in range(len(mat))]

    def _exp(self, x, e):
        if e < 0:
            return pow(self.f.inv(x), -e, self.f.p)
        return pow(x, e, self.f.p)

    # --- key schedule --------------------------------------------------------
    def unroll_constants(self) -> List[List[int]]:
        result = []
        key_state = [0] * self.registers
        key_injection = self.i_constants
        key_state = self._vadd(key_state, key_injection)
        result.append(list(key_state))
        for _ in range(self.rounds + 1):
            key_state = [self._exp(v, self.inv_alpha) for v in key_state]
            key_injection = self._vadd(self._mmul(self.c_matrix, key_injection),
                                       self.c_constants)
            key_state = self._vadd(self._mmul(self.mds, key_state), key_injection)
            result.append(list(key_state))
            key_state = [self._exp(v, self.alpha) for v in key_state]
            key_injection = self._vadd(self._mmul(self.c_matrix, key_injection),
                                       self.c_constants)
            key_state = self._vadd(self._mmul(self.mds, key_state), key_injection)
            result.append(list(key_state))
        return result

    def group_constants(self, constants: Sequence[Sequence[int]]):
        """(initialConstants, roundConstants) — utils.ts:167-186."""
        initial = list(constants[0]) + list(constants[1])
        m = self.registers
        round_constants = [[0] * self.rounds for _ in range(m * 2)]
        for i in range(self.rounds):
            k = 2 + 2 * i
            for j in range(m):
                round_constants[j][i] = constants[k][j]
                round_constants[m + j][i] = constants[k + 1][j]
        return initial, round_constants

    # --- sponges -------------------------------------------------------------
    def sponge(self, inputs: Sequence[int], unrolled_keys):
        state = list(inputs) + [0] * (self.registers - len(inputs))
        trace = [list(state)]
        state = self._vadd(state, unrolled_keys[0])
        trace.append(list(state))
        for r in range(self.rounds):
            k = 1 + 2 * r
            state = [self._exp(v, self.inv_alpha) for v in state]
            state = self._vadd(self._mmul(self.mds, state), unrolled_keys[k])
            trace.append(list(state))
            state = [self._exp(v, self.alpha) for v in state]
            state = self._vadd(self._mmul(self.mds, state), unrolled_keys[k + 1])
            trace.append(list(state))
        return state[:len(inputs)], trace

    def modified_sponge(self, inputs: Sequence[int], unrolled_keys):
        """Starts at round 1 with pre-mixed inputs (the STARK's per-cycle
        body; see buildInputs at hash2x64.ts:118-135)."""
        state = list(inputs) + [0] * (self.registers - len(inputs))
        trace = [list(state)]
        for r in range(self.rounds - 1):
            k = 2 + 2 * r
            state = [self._exp(v, self.alpha) for v in state]
            state = self._vadd(self._mmul(self.mds, state), unrolled_keys[k])
            trace.append(list(state))
            state = [self._exp(v, self.inv_alpha) for v in state]
            state = self._vadd(self._mmul(self.mds, state), unrolled_keys[k + 1])
            trace.append(list(state))
        return state[:len(inputs)], trace


def make_hash_function(rescue: Rescue, constants) -> Callable:
    """2-to-1 compression via modifiedSponge (utils.ts:11-15)."""
    def h(v1: int, v2: int) -> int:
        out, _ = rescue.modified_sponge([v1, v2, 0, 0], constants)
        return out[0]
    return h


class MerkleTree:
    """Scalar-value Merkle tree (rescue/utils.ts:232-273)."""

    def __init__(self, values: Sequence[int], hash_fn: Callable):
        n = len(values)
        self.nodes = [None] * n + list(values)
        for i in range(n - 1, 0, -1):
            self.nodes[i] = hash_fn(self.nodes[i * 2], self.nodes[i * 2 + 1])

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
    def verify(root: int, index: int, proof: Sequence[int], hash_fn) -> bool:
        index += 2 ** len(proof)
        v = proof[0]
        for i in range(1, len(proof)):
            v = hash_fn(proof[i], v) if index & 1 else hash_fn(v, proof[i])
            index >>= 1
        return root == v


def invert_matrix(field, mat):
    """Matrix inverse over the prime field (Gauss-Jordan).  The reference
    inlines precomputed inverse MDS matrices (e.g. hash2x64.ts:56-59); we
    derive them."""
    n = len(mat)
    a = [list(row) + [1 if i == j else 0 for j in range(n)]
         for i, row in enumerate(mat)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] % field.p != 0)
        a[col], a[piv] = a[piv], a[col]
        inv = field.inv(a[col][col])
        a[col] = [field.mul(x, inv) for x in a[col]]
        for r in range(n):
            if r != col and a[r][col] % field.p != 0:
                factor = a[r][col]
                a[r] = [field.sub(x, field.mul(factor, y))
                        for x, y in zip(a[r], a[col])]
    return [row[n:] for row in a]
