"""Device-side query sampling / augmentation / batch-proof planning
(protocol/device_queries.py) vs the host implementations they replicate
(protocol/queries.py, protocol/fri.py, merkle.plan_batch) — must agree
bit-exactly: the verifier re-derives all of it on host."""

import hashlib
import random

import numpy as np
import pytest


def _seed_words(seed: bytes):
    import jax.numpy as jnp
    assert len(seed) == 32
    return jnp.asarray(np.frombuffer(seed, dtype="<u4"))


@pytest.mark.parametrize("count,max_,excl", [
    (48, 1 << 17, 16),
    (32, 1 << 13, 4),
    (12, 1 << 10, 16),
    (8, 1 << 8, 0),
    (64, 1 << 25, 16),
])
def test_sample_indexes_matches_host(count, max_, excl):
    from genstark_tpu.protocol.device_queries import sample_indexes_dev
    from genstark_tpu.protocol.queries import get_pseudorandom_indexes

    rng = random.Random(count * max_ + excl)
    for trial in range(4):
        seed = bytes(rng.randrange(256) for _ in range(32))
        # odd-hex states (P = 1/16) make runs of ~16 consecutive candidates
        # hash identically (the dropped trailing nibble absorbs +1), so the
        # window is sized ~16x the target
        n_cand = 32 * count + 512
        idx, found = sample_indexes_dev(_seed_words(seed), count, max_,
                                        excl, n_cand)
        host = get_pseudorandom_indexes(seed, count, max_, excl)
        found = int(found)
        assert found <= count
        got = list(np.asarray(idx))[:found]
        assert got == host[:found]
        if found == count:
            assert got == host


def test_sample_indexes_odd_hex_lengths():
    """Seeds chosen so sha256(seed) starts with a zero nibble / zero bytes
    exercise the variable hex-length + odd-nibble-drop path."""
    from genstark_tpu.protocol.device_queries import sample_indexes_dev
    from genstark_tpu.protocol.queries import get_pseudorandom_indexes

    found_short = 0
    rng = random.Random(7)
    trials = 0
    while found_short < 3 and trials < 400:
        seed = bytes(rng.randrange(256) for _ in range(32))
        digest = hashlib.sha256(seed).digest()
        if digest[0] >= 16:         # want a short/odd hex state
            trials += 1
            continue
        found_short += 1
        trials += 1
        idx, found = sample_indexes_dev(_seed_words(seed), 16, 1 << 12, 4,
                                        1024)
        host = get_pseudorandom_indexes(seed, 16, 1 << 12, 4)
        assert int(found) == 16
        assert list(np.asarray(idx)) == host
    assert found_short >= 3


def test_augmentations_match_host():
    import jax.numpy as jnp
    from genstark_tpu.protocol.device_queries import (augment_fri,
                                                      augment_stark)
    from genstark_tpu.protocol.fri import get_augmented_positions as fri_aug

    rng = random.Random(3)
    for _ in range(10):
        N = 1 << rng.randrange(8, 16)
        ext = 16
        C = rng.randrange(4, 40)
        pos = rng.sample(range(N), C)
        # stark variant
        out = dict()
        for p in pos:
            out[p] = True
            out[(p + ext) % N] = True
        want = list(out.keys())
        aug, n = augment_stark(jnp.asarray(pos, dtype=jnp.int32), ext, N)
        assert int(n) == len(want)
        assert list(np.asarray(aug))[:len(want)] == want
        # fri variant
        want_f = fri_aug(pos, N)
        augf, nf = augment_fri(jnp.asarray(pos, dtype=jnp.int32), N)
        assert int(nf) == len(want_f)
        assert list(np.asarray(augf))[:len(want_f)] == want_f


def test_plan_rows_match_host():
    import jax.numpy as jnp
    from genstark_tpu.merkle import _level_offset, plan_batch
    from genstark_tpu.protocol.device_queries import plan_rows_dev

    rng = random.Random(11)
    for _ in range(10):
        depth = rng.randrange(3, 14)
        n = 1 << depth
        C = rng.randrange(2, min(40, n))
        pos = rng.sample(range(n), C)
        emissions, coords = plan_batch(pos, depth)
        want = [_level_offset(n, level) + idx for level, idx in coords]
        cap = C * (1 + depth)
        Cp = C + 3                      # padded slots must be ignored
        pos_pad = jnp.asarray(pos + [0] * (Cp - C), dtype=jnp.int32)
        rows, n_rows = plan_rows_dev(pos_pad, C, depth, n, cap,
                                     _level_offset)
        assert int(n_rows) == len(want)
        assert list(np.asarray(rows))[:len(want)] == want
