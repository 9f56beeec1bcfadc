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
