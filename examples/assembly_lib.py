"""AirAssembly stdlib demos: Poseidon hash / Merkle root / Merkle update /
Schnorr components from the framework's OWN generated stdlib
(genstark_tpu/stdlib — behavioral spec:
/root/reference/examples/assembly/lib128.ts and lib224.ts).

- lib128 (p = 2^128 - 9*2^32 + 1): ComputePoseidonHash (6 regs),
  ComputeMerkleRoot (12 regs), ComputeMerkleUpdate (24 regs).
- lib224 (p = 2^224 - 2^96 + 1): the 3-wide Poseidon variants plus
  VerifySchnorrSignature (14 regs x 256 steps over secp224r1,
  /root/reference/assembly/README.md:55-68).

The reference checkout is NOT required: the sources are generated from the
repo's own constant derivations.  tests/test_assembly_stdlib.py
cross-checks the generated modules against the reference's `.aa` files when
those are present on disk.

Oracles: poseidon_utils.create_hash with the same prng-derived round
constants the generated cycles declare.
"""

from __future__ import annotations

from typing import List, Optional

from genstark_tpu import instantiate
from genstark_tpu.field import P128, P224, create_prime_field
from genstark_tpu.protocol import Assertion
from genstark_tpu.stdlib import lib128_source, lib224_source

from .poseidon_utils import (MerkleTree, MerkleTree2, create_hash,
                             to_binary_array, transpose)

F_ROUNDS, P_ROUNDS, SBOX = 8, 55, 5
STEPS = 64

OPTIONS_128 = {                       # lib128.ts:33-38
    "hash_algorithm": "blake2s256", "extension_factor": 32,
    "exe_query_count": 44, "fri_query_count": 20,
}
OPTIONS_224 = dict(OPTIONS_128)       # lib224.ts:29-35


def make_stark(lib: str, component: str, options: Optional[dict] = None,
               logger=None):
    source = lib128_source() if lib == "128" else lib224_source()
    return instantiate(source, component,
                       options or dict(OPTIONS_128 if lib == "128"
                                       else OPTIONS_224), logger)


def poseidon_oracle(lib: str):
    """Poseidon with the prng-derived constants the .aa cycles declare
    (lib128.ts:20-28 / lib224.ts:20-25)."""
    if lib == "128":
        field, width = create_prime_field(P128), 6
    else:
        field, width = create_prime_field(P224), 3
    cols = [field.prng(f"Hades{j}".encode(), STEPS)
            for j in range(1, width + 1)]
    return field, create_hash(field.host, SBOX, F_ROUNDS, P_ROUNDS, width,
                              transpose(cols))


def run_hash(lib: str = "128", options: Optional[dict] = None, logger=None):
    """lib128.ts testHash: trace ends at the oracle hash."""
    field, oracle = poseidon_oracle(lib)
    stark = make_stark(lib, "ComputePoseidonHash", options, logger)
    values = [42, 43, 44, 45] if lib == "128" else [42, 43]
    control = oracle(values)
    inputs = [[v] for v in values]
    assertions = [Assertion(step=STEPS - 1, register=0, value=control[0]),
                  Assertion(step=STEPS - 1, register=1, value=control[1])]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions


def run_merkle_proof(lib: str = "128", tree_depth: int = 4, index: int = 5,
                     options: Optional[dict] = None, logger=None):
    """lib128.ts testMerkleProof / lib224 variant (scalar leaves)."""
    field, oracle = poseidon_oracle(lib)
    stark = make_stark(lib, "ComputeMerkleRoot", options, logger)
    bits = [0] + to_binary_array(index, tree_depth)[:-1]
    T = tree_depth * STEPS
    if lib == "128":
        leaves = [[field.prng(b"\x2a", 2 ** tree_depth)[i],
                   field.prng(b"\x2b", 2 ** tree_depth)[i]]
                  for i in range(2 ** tree_depth)]
        tree = MerkleTree(leaves, oracle)
        branch = tree.prove(index)
        nodes = transpose(branch[1:])
        inputs = [[branch[0][0]], [branch[0][1]], [nodes[0]], [nodes[1]], [bits]]
        assertions = [Assertion(step=T - 1, register=0, value=tree.root[0]),
                      Assertion(step=T - 1, register=1, value=tree.root[1])]
    else:
        leaves = field.prng(b"\x2a", 2 ** tree_depth)
        tree = MerkleTree2(leaves, oracle)
        branch = tree.prove(index)
        inputs = [[branch[0]], [branch[1:]], [bits]]
        assertions = [Assertion(step=T - 1, register=0, value=tree.root)]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions, [[bits]]


# --- Schnorr signature over secp224r1 (lib224 only) ---------------------------

# lib224.ts:163-167
SCHNORR_G = (19277929113566293071110308034699488026831934219452440156649784352033,
             19926808758034470970197974370888749184205991990603949537637343198772)
SCHNORR_P = (24313447595084304058594233432514534662288062665585856194673052057742,
             11283561012092599727291782123823281550391964133479792543258386661577)
SCHNORR_R = (24205906543396144211665254343088405371302546890229844964400088231402,
             14288195710129182954662708611241591530837581261860973703071318732478)
SCHNORR_S = 4985319172797574202062022188522117996928464993099991051165884930508
SCHNORR_H = 22415580945459993343509530426358128444740520478775315096153588998695


def to_bits256(value: int) -> List[int]:
    return [(value >> i) & 1 for i in range(256)]


def run_schnorr(options: Optional[dict] = None, logger=None):
    """VerifySchnorrSignature (lib224.ts:161-208): checks s*G + h*P == R."""
    stark = make_stark("224", "VerifySchnorrSignature", options, logger)
    g, p, r = SCHNORR_G, SCHNORR_P, SCHNORR_R
    inputs = [[g[0]], [g[1]], [to_bits256(SCHNORR_S)],
              [p[0]], [p[1]], [to_bits256(SCHNORR_H)],
              [r[0]], [r[1]]]
    assertions = [
        Assertion(step=0, register=0, value=g[0]),
        Assertion(step=0, register=1, value=g[1]),
        Assertion(step=0, register=2, value=0),
        Assertion(step=0, register=3, value=0),
        Assertion(step=0, register=7, value=p[0]),
        Assertion(step=0, register=8, value=p[1]),
        Assertion(step=0, register=9, value=r[0]),
        Assertion(step=0, register=10, value=r[1]),
        Assertion(step=255, register=13, value=SCHNORR_H),
    ]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions


if __name__ == "__main__":
    stark, proof, assertions = run_hash("128")
    assert stark.verify(assertions, proof)
    print(f"lib128 poseidon hash: proof {stark.size_of(proof)} bytes")
    stark, proof, assertions, public = run_merkle_proof("224")
    assert stark.verify(assertions, proof, public_inputs=public)
    print(f"lib224 merkle root: proof {stark.size_of(proof)} bytes")
    stark, proof, assertions = run_schnorr()
    assert stark.verify(assertions, proof)
    print(f"lib224 schnorr: proof {stark.size_of(proof)} bytes")
