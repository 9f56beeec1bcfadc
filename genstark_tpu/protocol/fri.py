"""Fold-by-4 FRI low-degree prover / verifier.

Protocol-equivalent of /root/reference/lib/components/LowDegreeProver.ts:
same layer structure (stride-transposed [M, 4] rows, Merkle per layer,
specialX = prng(layer root), <=256-value remainder directly degree-checked),
same Fiat-Shamir (getFriIndexes per column root, augmented positions =
pos mod rowLength, insertion-ordered dedup), same proof component layout.

TPU-native difference: the fold does not build quartic coefficients.  For a
row with xs = {x, qx, -x, -qx} (q = w^(N/4), a primitive 4th root of unity)
the Lagrange evaluation at specialX s collapses to

    P(s) = inv4 * invx^3 * [ (s^2+x^2) (y0 (s+x) - y2 (s-x))
                           + invq (s^2-x^2) (y1 (s+qx) - y3 (s-qx)) ]

— ~11 mont_muls per row, no inversions at runtime (invx comes from the
precomputed inverse-domain power table).  The component count is sized
correctly (the reference's getComponentCount has a JS-only quirk —
LowDegreeProver.ts:287-291 — that must not be replicated; SURVEY.md section 7).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field import PrimeField
from ..field.limbs import limbs_to_ints
from ..hash import Hash, bytes_to_words_le, digests_to_bytes
from ..merkle import BatchMerkleProof, MerkleTree
from .proof import FriComponent, LowDegreeProof
from .queries import QueryIndexGenerator

MAX_REMAINDER_LENGTH = 256


@jax.jit
def _gather_cols(v: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(v, idx, axis=1)


class StarkError(Exception):
    pass


def get_augmented_positions(positions: List[int], column_length: int) -> List[int]:
    """FRI-local augmentation: pos mod rowLength, insertion-ordered dedup
    (LowDegreeProver.ts:302-309 — distinct from the Stark-level one)."""
    row_length = column_length // 4
    out = dict()
    for p in positions:
        out[p % row_length] = True
    return list(out.keys())


class LowDegreeProver:
    def __init__(self, idx_generator: QueryIndexGenerator, hash_: Hash, context,
                 logger=None):
        self.field: PrimeField = context.field
        self.context = context
        self.hash = hash_
        self.idx_generator = idx_generator
        self.log = logger or (lambda msg: None)

    # ------------------------------------------------------------------ prove
    def prove(self, l_evaluations: jnp.ndarray, max_degree_plus1: int) -> LowDegreeProof:
        """l_evaluations: [L, Ne] Montgomery."""
        field = self.field
        dev = field.device
        Ne = l_evaluations.shape[-1]
        v_std = dev.from_mont(l_evaluations)
        row_hashes = self.hash.digest_stride_rows(v_std, field.element_size)
        p_tree = MerkleTree.create(row_hashes, self.hash)
        self.log("Built liner combination merkle tree")

        exe_positions = self.idx_generator.get_exe_indexes(p_tree.root, Ne)
        lc_positions = get_augmented_positions(exe_positions, Ne)
        lc_proof = p_tree.prove_batch(lc_positions)
        lc_proof.values = self._rows_bytes(v_std, lc_positions, Ne // 4)
        self.log(f"Computed {len(lc_positions)} linear combination spot checks")

        proof = LowDegreeProof(lc_root=p_tree.root, lc_proof=lc_proof,
                               components=[], remainder=[])
        self._fri(p_tree, l_evaluations, v_std, max_degree_plus1, 0, proof)
        return proof

    def _fri(self, p_tree: MerkleTree, values: jnp.ndarray, v_std: jnp.ndarray,
             max_degree_plus1: int, depth: int, proof: LowDegreeProof) -> None:
        field = self.field
        f = field.host
        N = values.shape[-1]
        if N <= MAX_REMAINDER_LENGTH:
            remainder = limbs_to_ints(np.asarray(v_std))
            root_of_unity = f.exp(self.context.root_of_unity, 4 ** depth)
            self.verify_remainder(remainder, max_degree_plus1, root_of_unity)
            proof.remainder = remainder
            self.log(f"Computed FRI remainder of {len(remainder)} values")
            return

        special_x = field.prng(p_tree.root)
        column = self._fold(values, depth, special_x)                 # [L, N/4]
        c_std = field.device.from_mont(column)
        row_hashes = self.hash.digest_stride_rows(c_std, field.element_size)
        c_tree = MerkleTree.create(row_hashes, self.hash)
        self.log(f"Computed FRI layer at depth {depth}")

        self._fri(c_tree, column, c_std, max_degree_plus1 // 4, depth + 1, proof)

        column_length = N // 4
        positions = self.idx_generator.get_fri_indexes(c_tree.root, column_length)
        augmented = get_augmented_positions(positions, column_length)

        column_proof = c_tree.prove_batch(augmented)
        column_proof.values = self._rows_bytes(c_std, augmented, column_length // 4)
        poly_proof = p_tree.prove_batch(positions)
        poly_proof.values = self._rows_bytes(v_std, positions, N // 4)

        proof.components.insert(0, FriComponent(column_root=c_tree.root,
                                                column_proof=column_proof,
                                                poly_proof=poly_proof))

    # ---------------------------------------------------------------- folding
    def _fold(self, values: jnp.ndarray, depth: int, special_x: int) -> jnp.ndarray:
        f = self.field.host
        dev = self.field.device
        c_s = dev.const(special_x, shape=(1,))
        c_s2 = dev.const(f.mul(special_x, special_x), shape=(1,))
        return _fold_jit(self.field, self.context.root_of_unity,
                         self.context.evaluation_domain_size, depth)(values, c_s, c_s2)

    def _rows_bytes(self, v_std: jnp.ndarray, rows: List[int],
                    row_count: int) -> List[bytes]:
        """Bytes of stride rows r: elements r, r+M, r+2M, r+3M (little-endian),
        matching galois Matrix.rowsToBuffers on transposeVector output.
        One device gather for all requested rows (no full-column transfer)."""
        elem = self.field.element_size
        idx = jnp.asarray([r + j * row_count for r in rows for j in range(4)],
                          dtype=jnp.int32)
        cols = np.asarray(_gather_cols(v_std, idx))          # [L, 4*len(rows)]
        ints = limbs_to_ints(cols)
        out = []
        for i in range(len(rows)):
            out.append(b"".join(v.to_bytes(elem, "little")
                                for v in ints[4 * i:4 * i + 4]))
        return out

    # ---------------------------------------------------------------- verify
    def verify(self, proof: LowDegreeProof, lc_values: List[int],
               exe_positions: List[int], max_degree_plus1: int) -> bool:
        field = self.field
        f = field.host
        hash_ = self.hash
        root_of_unity = self.context.root_of_unity
        column_length = self.context.evaluation_domain_size

        quartic_roots = [1,
                         f.exp(root_of_unity, column_length // 4),
                         f.exp(root_of_unity, column_length // 2),
                         f.exp(root_of_unity, column_length * 3 // 4)]

        # 1 ----- linear combination correctness
        lc_positions = get_augmented_positions(exe_positions, column_length)
        lc_checks = self._parse_column_values(proof.lc_proof.values, exe_positions,
                                              lc_positions, column_length)
        lc_digests = [hash_.digest(v) for v in proof.lc_proof.values]
        rehashed = BatchMerkleProof(values=lc_digests, nodes=proof.lc_proof.nodes,
                                    depth=proof.lc_proof.depth)
        if not MerkleTree.verify_batch(proof.lc_root, lc_positions, rehashed, hash_):
            raise StarkError("Verification of linear combination Merkle proof failed")
        for got, want in zip(lc_values, lc_checks):
            if got != want:
                raise StarkError("Verification of linear combination correctness failed")

        # 2 ----- recursive components
        p_root = proof.lc_root
        column_length //= 4
        for depth, component in enumerate(proof.components):
            positions = self.idx_generator.get_fri_indexes(component.column_root,
                                                           column_length)
            augmented = get_augmented_positions(positions, column_length)

            column_values = self._parse_column_values(component.column_proof.values,
                                                      positions, augmented,
                                                      column_length)
            col_digests = [hash_.digest(v) for v in component.column_proof.values]
            col_proof = BatchMerkleProof(values=col_digests,
                                         nodes=component.column_proof.nodes,
                                         depth=component.column_proof.depth)
            if not MerkleTree.verify_batch(component.column_root, augmented,
                                           col_proof, hash_):
                raise StarkError(f"Verification of column Merkle proof failed at depth {depth}")

            poly_values = self._parse_poly_values(component.poly_proof.values)
            poly_digests = [hash_.digest(v) for v in component.poly_proof.values]
            pp = BatchMerkleProof(values=poly_digests,
                                  nodes=component.poly_proof.nodes,
                                  depth=component.poly_proof.depth)
            if not MerkleTree.verify_batch(p_root, positions, pp, hash_):
                raise StarkError(f"Verification of polynomial Merkle proof failed at depth {depth}")

            special_x = field.prng(p_root)
            self._check_quartics(f, root_of_unity, quartic_roots, positions,
                                 poly_values, column_values, special_x, depth)

            p_root = component.column_root
            root_of_unity = f.exp(root_of_unity, 4)
            max_degree_plus1 //= 4
            column_length //= 4

        # 3 ----- remainder
        if max_degree_plus1 > len(proof.remainder):
            raise StarkError("Remainder degree is greater than number of remainder values")
        # re-commit the remainder and compare to the last layer root
        n = len(proof.remainder)
        m = n // 4
        elem = field.element_size
        row_buffers = [b"".join(field.to_bytes(proof.remainder[r + j * m])
                                for j in range(4)) for r in range(m)]
        leaf_digests = [hash_.digest(b) for b in row_buffers]
        c_tree = MerkleTree.create_from_bytes(leaf_digests, hash_)
        if c_tree.root != p_root:
            raise StarkError("Remainder values do not match Merkle root of the last column")

        self.verify_remainder(proof.remainder, max_degree_plus1, root_of_unity)
        return True

    @staticmethod
    def _check_quartics(f, w, quartic_roots, positions, poly_values,
                        column_values, special_x, depth) -> None:
        """The per-query degree-4 check of LowDegreeProver.ts:210-218 —
        interpolate {r_j * xe_i} -> ys_i, evaluate at special_x, compare to
        the column value — in closed form: the interpolation points are the
        4 roots of x^4 = xe^4, so with N(x) = x^4 - xe^4 and N'(x_j) =
        4 x_j^3,  P(x*) = N(x*) * sum_j y_j / (4 x_j^3 (x* - x_j)).  All
        denominators of a layer invert in ONE batch (Montgomery's trick)
        instead of ~5 Fermat exponentiations per query in the generic
        Lagrange path — the verifier's former hot spot."""
        p = f.p
        c4 = [4 * pow(r, 3, p) % p for r in quartic_roots]
        sx4 = pow(special_x, 4, p)
        dens: List[int] = []
        rows = []
        for position in positions:
            xe = f.exp(w, position)
            xe3 = xe * xe % p * xe % p
            nx = (sx4 - xe3 * xe) % p                     # N(x*) = x*^4 - xe^4
            for j, r in enumerate(quartic_roots):
                dens.append(c4[j] * xe3 % p * ((special_x - r * xe) % p) % p)
            rows.append(nx)
        try:
            invs = f.batch_inv(dens)
        except ZeroDivisionError:
            # special_x collided with an interpolation point (probability
            # ~4n/p for a transcript-derived x*): generic fallback
            for i, position in enumerate(positions):
                xe = f.exp(w, position)
                xs = [f.mul(qr, xe) for qr in quartic_roots]
                poly = f.interpolate(xs, poly_values[i])
                if f.eval_poly_at(poly, special_x) != column_values[i]:
                    raise StarkError(
                        f"Degree 4 polynomial didn't evaluate to column value at depth {depth}")
            return
        for i in range(len(positions)):
            acc = 0
            for j in range(4):
                acc = (acc + poly_values[i][j] * invs[4 * i + j]) % p
            if rows[i] * acc % p != column_values[i]:
                raise StarkError(
                    f"Degree 4 polynomial didn't evaluate to column value at depth {depth}")

    def verify_remainder(self, remainder: List[int], max_degree_plus1: int,
                         root_of_unity: int) -> None:
        """Exclude extension-factor multiples, interpolate maxDegreePlus1 of the
        rest, check every other point (LowDegreeProver.ts:223-252)."""
        f = self.field.host
        ext = self.idx_generator.extension_factor
        positions = [i for i in range(len(remainder)) if not ext or i % ext]
        if max_degree_plus1 > len(positions):
            raise StarkError("Remainder degree is greater than number of remainder values")
        domain = f.get_power_series(root_of_unity, len(remainder))
        xs = [domain[positions[i]] for i in range(max_degree_plus1)]
        ys = [remainder[positions[i]] for i in range(max_degree_plus1)]
        poly = f.interpolate(xs, ys)
        for i in range(max_degree_plus1, len(positions)):
            p = positions[i]
            if f.eval_poly_at(poly, domain[p]) != remainder[p]:
                raise StarkError(
                    f"Remainder is not a valid degree {max_degree_plus1 - 1} polynomial")

    # ---------------------------------------------------------------- parsers
    def _parse_poly_values(self, buffers: List[bytes]) -> List[List[int]]:
        elem = self.field.element_size
        out = []
        for buf in buffers:
            out.append([int.from_bytes(buf[i * elem:(i + 1) * elem], "little")
                        for i in range(4)])
        return out

    def _parse_column_values(self, buffers: List[bytes], positions: List[int],
                             augmented_positions: List[int],
                             column_length: int) -> List[int]:
        row_length = column_length // 4
        elem = self.field.element_size
        out = []
        for position in positions:
            idx = augmented_positions.index(position % row_length)
            buf = buffers[idx]
            offset = (position // row_length) * elem
            out.append(int.from_bytes(buf[offset:offset + elem], "little"))
        return out


@lru_cache(maxsize=None)
def _domain_tables(field: PrimeField, root_of_unity: int, size: int):
    """Forward and inverse power tables of the evaluation domain, on device."""
    dev = field.device
    fwd = dev.power_series(root_of_unity, size)
    inv = dev.power_series(field.inv(root_of_unity), size)
    return fwd, inv


def fold_traced(field: PrimeField, root_of_unity: int, domain_size: int,
                depth: int, values: jnp.ndarray, c_s: jnp.ndarray,
                c_s2: jnp.ndarray, domain_tables=None, xtabs=None) -> jnp.ndarray:
    """Traceable quartic fold at `depth`: values [L, N] -> [L, N/4], where
    N = domain_size / 4^depth.  c_s / c_s2 are specialX and specialX^2 as
    [L, 1] Montgomery arrays (traced — they come from the transcript).
    domain_tables: optional (fwd, inv) [L, domain_size] power tables passed
    as traced program parameters.  xtabs: optional (x_tab, ix_tab) [L, N/4]
    per-depth tables of (w^(4^depth))^i and its inverse — the fused prover
    passes these directly so the full-domain tables are never materialized
    (at Ne = 2^24 each would be a 512 MB array)."""
    f = field.host
    dev = field.device
    stride = 4 ** depth
    N = domain_size // stride
    M = N // 4
    if xtabs is not None:
        x_tab, ix_tab = xtabs
    else:
        fwd, inv = domain_tables if domain_tables is not None else \
            _domain_tables(field, root_of_unity, domain_size)
        # every stride-th domain power, via gather: a strided lax.slice at
        # large stride makes XLA:TPU stage the whole source region through
        # scoped VMEM (OOMs at Ne = 2^21), a gather does not
        pick = jax.lax.iota(jnp.int32, M) * jnp.int32(stride)
        x_tab = jnp.take(fwd, pick, axis=1)
        ix_tab = jnp.take(inv, pick, axis=1)

    q = f.exp(root_of_unity, domain_size // 4)       # primitive 4th root
    inv4 = f.inv(4)
    inv_q = f.inv(q)

    c_q = dev.const(q, shape=(1,))
    c4 = dev.const(inv4, shape=(1,))
    c4q = dev.const(f.mul(inv4, inv_q), shape=(1,))

    y = values.reshape(dev.L, 4, M)
    y0, y1, y2, y3 = y[:, 0], y[:, 1], y[:, 2], y[:, 3]
    x = x_tab
    ix = ix_tab
    x2 = dev.mont_mul(x, x)
    qx = dev.mont_mul(c_q, x)
    s_plus_x = dev._add(c_s, x)
    s_minus_x = dev._sub(c_s, x)
    t02 = dev.mont_mul(dev._add(c_s2, x2),
                       dev._sub(dev.mont_mul(y0, s_plus_x),
                                dev.mont_mul(y2, s_minus_x)))
    t13 = dev.mont_mul(dev._sub(c_s2, x2),
                       dev._sub(dev.mont_mul(y3, dev._sub(c_s, qx)),
                                dev.mont_mul(y1, dev._add(c_s, qx))))
    ix3 = dev.mont_mul(dev.mont_mul(ix, ix), ix)
    acc = dev._add(dev.mont_mul(t02, c4), dev.mont_mul(t13, c4q))
    return dev.mont_mul(acc, ix3)


@lru_cache(maxsize=None)
def _fold_jit(field: PrimeField, root_of_unity: int, domain_size: int, depth: int):
    """Jitted quartic fold for one (domain, depth); specialX is a traced arg."""
    return jax.jit(lambda values, c_s, c_s2: fold_traced(
        field, root_of_unity, domain_size, depth, values, c_s, c_s2))
