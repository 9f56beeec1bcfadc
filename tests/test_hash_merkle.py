"""Hash + Merkle layer tests against hashlib and hand-built trees."""

import hashlib
import random

import numpy as np
import jax.numpy as jnp
import pytest

from genstark_tpu.hash import (Hash, bytes_to_words_le, create_hash,
                               digests_to_bytes, elements_to_words)
from genstark_tpu.field import create_prime_field, P128
from genstark_tpu.merkle import MerkleTree


@pytest.mark.parametrize("alg,ref", [("sha256", hashlib.sha256),
                                     ("blake2s256", hashlib.blake2s)])
@pytest.mark.parametrize("msg_bytes", [16, 32, 48, 64, 68, 128, 192])
def test_digest_rows_matches_hashlib(alg, ref, msg_bytes):
    rng = random.Random(msg_bytes)
    h = create_hash(alg)
    msgs = [bytes(rng.randrange(256) for _ in range(msg_bytes)) for _ in range(5)]
    words = jnp.asarray(np.stack([bytes_to_words_le(m) for m in msgs], axis=1))
    got = digests_to_bytes(np.asarray(h.digest_rows(words, msg_bytes)))
    assert got == [ref(m).digest() for m in msgs]


def test_merge_element_rows():
    f = create_prime_field(P128)
    rng = random.Random(9)
    n = 8
    v0 = [rng.randrange(P128) for _ in range(n)]
    v1 = [rng.randrange(P128) for _ in range(n)]
    d0 = f.device.from_ints(v0, to_mont=False)
    d1 = f.device.from_ints(v1, to_mont=False)
    h = create_hash("blake2s256")
    got = digests_to_bytes(np.asarray(h.merge_element_rows([d0, d1], f.element_size)))
    want = [hashlib.blake2s(f.to_bytes(a) + f.to_bytes(b)).digest()
            for a, b in zip(v0, v1)]
    assert got == want


def test_digest_stride_rows():
    f = create_prime_field(P128)
    rng = random.Random(10)
    n = 16
    vals = [rng.randrange(P128) for _ in range(n)]
    d = f.device.from_ints(vals, to_mont=False)
    h = create_hash("sha256")
    got = digests_to_bytes(np.asarray(h.digest_stride_rows(d, f.element_size)))
    m = n // 4
    want = [hashlib.sha256(b"".join(f.to_bytes(vals[r + k * m]) for k in range(4))).digest()
            for r in range(m)]
    assert got == want


def test_merkle_tree_and_batch_proofs():
    rng = random.Random(11)
    h = create_hash("sha256")
    n = 64
    leaves = [hashlib.sha256(bytes([i])).digest() for i in range(n)]
    # word-major [8, n] leaf digests
    words = jnp.asarray(np.stack([bytes_to_words_le(l) for l in leaves], axis=1))
    # device-built tree equals host-built tree
    tree_d = MerkleTree.create(words, h)
    tree_h = MerkleTree.create_from_bytes(leaves, h)
    assert tree_d.root == tree_h.root
    assert tree_d.depth == 6

    for trial in range(10):
        k = rng.randrange(1, 12)
        positions = rng.sample(range(n), k)
        proof = tree_d.prove_batch(positions)
        assert proof.values == [leaves[p] for p in positions]
        assert MerkleTree.verify_batch(tree_d.root, positions, proof, h)
        # tampered value fails
        bad = BatchProofCopy(proof)
        bad.values[0] = hashlib.sha256(b"tampered").digest()
        assert not MerkleTree.verify_batch(tree_d.root, positions, bad, h)
        # wrong root fails
        assert not MerkleTree.verify_batch(leaves[0], positions, proof, h)
        # truncated nodes fail
        bad2 = BatchProofCopy(proof)
        if any(bad2.nodes):
            for col in bad2.nodes:
                if col:
                    col.pop()
                    break
            assert not MerkleTree.verify_batch(tree_d.root, positions, bad2, h)


def BatchProofCopy(proof):
    from genstark_tpu.merkle import BatchMerkleProof
    return BatchMerkleProof(values=list(proof.values),
                            nodes=[list(c) for c in proof.nodes],
                            depth=proof.depth)


def test_merkle_exhaustive_tamper_rejection():
    """Soundness: flipping ANY single node or value byte must be rejected.
    (Regression for the path-merge bind bug found during verification.)"""
    rng = random.Random(13)
    h = create_hash("sha256")
    leaves = [hashlib.sha256(i.to_bytes(2, "big")).digest() for i in range(64)]
    tree = MerkleTree.create_from_bytes(leaves, h)
    for k in [1, 7, 40, 63, 64]:
        positions = rng.sample(range(64), k)
        proof = tree.prove_batch(positions)
        assert MerkleTree.verify_batch(tree.root, positions, proof, h)
        for ci, col in enumerate(proof.nodes):
            for ni in range(len(col)):
                bad = BatchProofCopy(proof)
                nb = bytearray(bad.nodes[ci][ni])
                nb[0] ^= 1
                bad.nodes[ci][ni] = bytes(nb)
                assert not MerkleTree.verify_batch(tree.root, positions, bad, h)
        for vi in range(len(proof.values)):
            bad = BatchProofCopy(proof)
            vb = bytearray(bad.values[vi])
            vb[0] ^= 1
            bad.values[vi] = bytes(vb)
            assert not MerkleTree.verify_batch(tree.root, positions, bad, h)


def test_merkle_single_leaf():
    h = create_hash("sha256")
    leaf = hashlib.sha256(b"x").digest()
    tree = MerkleTree.create_from_bytes([leaf], h)
    assert tree.root == leaf
    proof = tree.prove_batch([0])
    assert MerkleTree.verify_batch(tree.root, [0], proof, h)
