"""Pinned vectors for every behavior listed in COMPATIBILITY.md — the
consolidated compatibility contract vs the reference.  If any of these move,
COMPATIBILITY.md is out of date (or a transcript-relevant behavior broke)."""

import hashlib

from examples.mimc import make_mimc_stark, run_mimc
from genstark_tpu.field import P32, P128, create_prime_field
from genstark_tpu.hash import create_hash
from genstark_tpu.merkle import MerkleTree
from genstark_tpu.protocol import Assertion
from genstark_tpu.protocol.queries import get_pseudorandom_indexes


def test_prng_scheme_pinned():
    # COMPATIBILITY.md section 3.1
    f = create_prime_field(P128)
    assert f.host.prng(bytes.fromhex("4d694d43"), 3) == [
        263262655175731449312601321339524907337,
        22932612066565261869401208975084711490,
        156972876274615784915250253023584871668]
    assert f.host.prng(hashlib.sha256(b"compat").digest(), 2) == [
        52717886697249631914586660218732671295,
        5883570981847881198940689970752525983]


def test_mimc_constants_p32_pinned():
    # COMPATIBILITY.md section 3.4
    f = create_prime_field(P32)
    assert f.host.prng(bytes.fromhex("4d694d43"), 3) == [
        809308379, 2497234509, 3283434799]


def test_query_sampling_pinned():
    # COMPATIBILITY.md section 1 (bit-exact QueryIndexGenerator semantics)
    seed = hashlib.sha256(b"compat").digest()
    assert get_pseudorandom_indexes(seed, 6, 1024, 8) == [
        891, 910, 1023, 193, 515, 997]


def test_merkle_dedup_layout_pinned():
    # COMPATIBILITY.md section 3.2
    h = create_hash("sha256")
    leaves = [hashlib.sha256(bytes([i])).digest() for i in range(8)]
    t = MerkleTree.create_from_bytes(leaves, h)
    assert t.root.hex() == (
        "0727b310f87099c1ba2ec0ba408def82c308237c8577f0bdfd2643e9cc6b7578")
    proof = t.prove_batch([1, 6])
    assert proof.depth == 3
    assert [[d.hex()[:8] for d in col] for col in proof.nodes] == [
        ["6e340b9c", "c2768b34"], ["ca358758", "f03808f5"]]
    assert MerkleTree.verify_batch(t.root, [1, 6], proof, h)


def test_golden_proof_bytes():
    # COMPATIBILITY.md section 4 — whole-transcript pin
    stark, constants = make_mimc_stark(
        64, modulus=P32, use_input=False, constant_count=16,
        options={"extension_factor": 4, "exe_query_count": 8,
                 "fri_query_count": 6})
    field = stark.air.field
    controls = run_mimc(field, 64, constants, 3)
    assertions = [Assertion(0, 0, controls[0]), Assertion(63, 0, controls[-1])]
    data = stark.serialize(stark.prove(assertions, [], [3]))
    assert len(data) == 3472
    assert hashlib.sha256(data).hexdigest() == (
        "db79f92dcacf2cf2d1eeb7cee8db4a4eeb1e5bc5f4d13e9b0cdaacab7cc95b75")
