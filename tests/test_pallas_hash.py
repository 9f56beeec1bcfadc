"""Bit-exactness of the Pallas hash kernels vs hashlib, via the Pallas
interpreter (runs on CPU; the same kernel code executes on real TPUs)."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np
import pytest

from genstark_tpu.hash import bytes_to_words_le, digests_to_bytes
from genstark_tpu.hash import pallas_hash


@pytest.mark.parametrize("alg,ref", [("sha256", hashlib.sha256),
                                     ("blake2s256", hashlib.blake2s)])
@pytest.mark.parametrize("msg_bytes", [16, 32, 48, 64, 96, 192])
def test_pallas_digest_matches_hashlib(alg, ref, msg_bytes):
    rng = random.Random(msg_bytes)
    batch = 256
    msgs = [bytes(rng.randrange(256) for _ in range(msg_bytes))
            for _ in range(batch)]
    words = jnp.asarray(np.stack([bytes_to_words_le(m) for m in msgs], axis=1))
    got = digests_to_bytes(np.asarray(
        pallas_hash.digest_rows_le(words, msg_bytes, alg, interpret=True)))
    assert got == [ref(m).digest() for m in msgs]


@pytest.mark.parametrize("alg,ref", [("sha256", hashlib.sha256),
                                     ("blake2s256", hashlib.blake2s)])
def test_pallas_limb_rows_matches_hashlib(alg, ref):
    """digest_limb_rows: in-kernel LE-word build from V standard-form limb
    arrays == hashing the concatenated little-endian element bytes."""
    from genstark_tpu.field import P128, create_prime_field

    field = create_prime_field(P128)
    dev = field.device
    rng = random.Random(3)
    batch, V = 256, 3
    elem = field.element_size
    ints = [[rng.randrange(field.modulus) for _ in range(batch)]
            for _ in range(V)]
    vectors = [dev.from_ints(v, to_mont=False) for v in ints]
    got = digests_to_bytes(np.asarray(pallas_hash.digest_limb_rows(
        vectors, elem, alg, interpret=True)))
    want = [ref(b"".join(ints[v][i].to_bytes(elem, "little")
                         for v in range(V))).digest() for i in range(batch)]
    assert got == want


@pytest.mark.parametrize("alg,ref", [("sha256", hashlib.sha256),
                                     ("blake2s256", hashlib.blake2s)])
def test_pallas_stride4_rows_matches_hashlib(alg, ref):
    """digest_stride4_rows == hashing rows [v[r], v[r+M], v[r+2M], v[r+3M]]."""
    from genstark_tpu.field import P128, create_prime_field

    field = create_prime_field(P128)
    dev = field.device
    rng = random.Random(9)
    M = 256
    N = 4 * M
    elem = field.element_size
    ints = [rng.randrange(field.modulus) for _ in range(N)]
    values = dev.from_ints(ints, to_mont=False)
    got = digests_to_bytes(np.asarray(pallas_hash.digest_stride4_rows(
        values, elem, alg, interpret=True)))
    want = [ref(b"".join(ints[r + k * M].to_bytes(elem, "little")
                         for k in range(4))).digest() for r in range(M)]
    assert got == want
