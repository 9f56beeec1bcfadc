"""Device-side Fiat-Shamir PRNG must match HostField.prng bit-exactly:
the verifier recomputes coefficients/specialX on host from the same roots."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from genstark_tpu.field import P32, P64, P128, P224, P256, create_prime_field
from genstark_tpu.hash import bytes_to_words_le
from genstark_tpu.protocol.fiat_shamir import (digest_words_to_field_mont,
                                               prng_elements_dev,
                                               prng_single_dev)


@pytest.mark.parametrize("modulus", [P32, P64, P128, P224, P256])
def test_digest_reduction_matches_int_be(modulus):
    field = create_prime_field(modulus)
    dev = field.device
    rng = np.random.RandomState(7)
    digests_bytes = [rng.bytes(32) for _ in range(9)]
    words = jnp.asarray(np.stack([bytes_to_words_le(b) for b in digests_bytes],
                                 axis=1))                 # word-major [8, N]
    got = dev.to_ints(digest_words_to_field_mont(field, words))
    want = [int.from_bytes(b, "big") % modulus for b in digests_bytes]
    assert got == want


@pytest.mark.parametrize("modulus", [P32, P128])
@pytest.mark.parametrize("count", [1, 7, 130])
def test_prng_matches_host(modulus, count):
    field = create_prime_field(modulus)
    seed = hashlib.sha256(b"root-digest-seed").digest()
    seed_words = jnp.asarray(bytes_to_words_le(seed))
    got = field.device.to_ints(prng_elements_dev(field, seed_words, count))
    want = field.host.prng(seed, count)
    assert got == want


def test_prng_single_matches_host():
    field = create_prime_field(P128)
    seed = hashlib.sha256(b"layer-root").digest()
    seed_words = jnp.asarray(bytes_to_words_le(seed))
    got = field.device.to_ints(prng_single_dev(field, seed_words))[0]
    assert got == field.host.prng(seed)
