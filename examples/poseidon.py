"""Poseidon STARKs (AirScript), mirroring the reference's three configs:

- hash3x128  (/root/reference/examples/poseidon/hash3x128.ts): 3 regs x 64
  steps, S-box x^5, 8 full + 55 partial rounds, segment loops.
- hash6x128  (/root/reference/examples/poseidon/hash6x128.ts): 6 regs x 64
  steps, element[2] (width-2) inputs.
- merkle_proof (/root/reference/examples/poseidon/merkleProof.ts): 12 regs x
  (64 * depth) steps — dual Poseidon lanes over a Merkle branch with 2-element
  node values.

Oracles from poseidon_utils (independent Python Poseidon).
"""

from __future__ import annotations

from typing import List, Optional

from genstark_tpu import instantiate_script
from genstark_tpu.field import P128, create_prime_field
from genstark_tpu.protocol import Assertion
from genstark_tpu.utils import inline_matrix, inline_vector

from .poseidon_utils import (MerkleTree, create_hash, get_mds_matrix,
                             get_round_constants, to_binary_array, transpose)

F_ROUNDS, P_ROUNDS, SBOX = 8, 55, 5
STEPS = F_ROUNDS + P_ROUNDS + 1          # 64

HASH_OPTIONS = {                          # hash3x128.ts:35-41
    "hash_algorithm": "blake2s256",
    "extension_factor": 16,
    "exe_query_count": 68,
    "fri_query_count": 24,
}
MERKLE_OPTIONS = {                        # merkleProof.ts:25-31
    "hash_algorithm": "blake2s256",
    "extension_factor": 32,
    "exe_query_count": 44,
    "fri_query_count": 20,
}


def poseidon_params(width: int):
    field = create_prime_field(P128)
    mds = get_mds_matrix(field.host, width)
    # per-register round-constant cycles (transpose of ark rows), padded to 64
    ark = get_round_constants(field.host, width, STEPS)
    rc = transpose(ark)
    return field, mds, rc


# -----------------------------------------------------------------------------
# hash3x128 / hash6x128
# -----------------------------------------------------------------------------

def hash_source(width: int, mds, rc) -> str:
    rc_cycles = ",\n        ".join(f"cycle {inline_vector(c)}" for c in rc)
    if width == 3:
        inputs = "secret input value1: element[1];\n    secret input value2: element[1];"
        names = "value1, value2"
        init = "yield [value1, value2, 0];"
        partial = """v2 <- ($r2 + roundConstants[2])^5;
                yield mds # [...($r[0..1] + roundConstants[0..1]), v2];"""
    else:
        inputs = "secret input value1: element[2];\n    secret input value2: element[2];"
        names = "value1, value2"
        init = "yield [...value1, ...value2, 0, 0];"
        partial = """v5 <- ($r5 + roundConstants[5])^5;
                yield mds # [...($r[0..4] + roundConstants[0..4]), v5];"""
    return f"""
define Poseidon{width}x128 over prime field (2^128 - 9 * 2^32 + 1) {{
    const mds: {inline_matrix(mds)};

    static roundConstants: [
        {rc_cycles}
    ];

    {inputs}

    transition {width} registers {{
        for each ({names}) {{
            init {{ {init} }}
            for steps [1..4, 60..63] {{
                yield mds # ($r + roundConstants)^5;
            }}
            for steps [5..59] {{
                {partial}
            }}
        }}
    }}

    enforce {width} constraints {{
        for all steps {{
            enforce transition($r) = $n;
        }}
    }}
}}"""


def make_hash_stark(width: int = 3, options: Optional[dict] = None, logger=None):
    field, mds, rc = poseidon_params(width)
    stark = instantiate_script(hash_source(width, mds, rc),
                               options or dict(HASH_OPTIONS), logger)
    oracle = create_hash(field.host, SBOX, F_ROUNDS, P_ROUNDS, width)
    return stark, field, oracle


def run_hash(width: int = 3, options: Optional[dict] = None, logger=None):
    stark, field, oracle = make_hash_stark(width, options, logger)
    if width == 3:
        values = [42, 43]
        inputs = [[42], [43]]
    else:
        values = [1, 2, 3, 4]
        inputs = [[1], [2], [3], [4]]
    result = oracle(values)
    assertions = [Assertion(step=STEPS - 1, register=0, value=result[0]),
                  Assertion(step=STEPS - 1, register=1, value=result[1])]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions


# -----------------------------------------------------------------------------
# merkle_proof (12 registers, 6-wide Poseidon, 2-element leaves)
# -----------------------------------------------------------------------------

def merkle_source(mds, rc) -> str:
    """AirScript text of /root/reference/examples/poseidon/merkleProof.ts:34-102."""
    rc_cycles = ",\n        ".join(f"cycle {inline_vector(c)}" for c in rc)
    return f"""
define PoseidonMP over prime field (2^128 - 9 * 2^32 + 1) {{
    const mds: {inline_matrix(mds)};
    const alpha: {SBOX};

    static roundConstants: [
        {rc_cycles}
    ];

    secret input leaf       : element[2];
    secret input node       : element[2][1];
    public input indexBit   : boolean[1][1];

    transition 12 registers {{
        for each (leaf, node, indexBit) {{
            init {{
                S1 <- [...leaf, ...node, 0, 0];
                S2 <- [...node, ...leaf, 0, 0];
                yield [...S1, ...S2];
            }}
            for each (node, indexBit) {{
                init {{
                    H <- indexBit ? $r[6..7] : $r[0..1];
                    S1 <- [...H, ...node, 0, 0];
                    S2 <- [...node, ...H, 0, 0];
                    yield [...S1, ...S2];
                }}
                for steps [1..4, 60..63] {{
                    S1 <- mds # ($r[0..5] + roundConstants)^alpha;
                    S2 <- mds # ($r[6..11] + roundConstants)^alpha;
                    yield  [...S1, ...S2];
                }}
                for steps [5..59] {{
                    v1 <- ($r5 + roundConstants[5])^5;
                    S1 <- mds # [...($r[0..4] + roundConstants[0..4]), v1];
                    v2 <- ($r11 + roundConstants[5])^5;
                    S2 <- mds # [...($r[6..10] + roundConstants[0..4]), v2];
                    yield [...S1, ...S2];
                }}
            }}
        }}
    }}

    enforce 12 constraints {{
        for all steps {{
            enforce transition($r) = $n;
        }}
    }}
}}"""


def make_merkle_stark(options: Optional[dict] = None, logger=None):
    field, mds, rc = poseidon_params(6)
    stark = instantiate_script(merkle_source(mds, rc),
                               options or dict(MERKLE_OPTIONS), logger)
    oracle = create_hash(field.host, SBOX, F_ROUNDS, P_ROUNDS, 6)
    return stark, field, oracle


def build_leaves(field, count: int) -> List[List[int]]:
    """2-element leaves from the field PRNG (merkleProof.ts:154-167)."""
    v1 = field.prng(b"\x2a", count)
    v2 = field.prng(b"\x2b", count)
    return [[v1[i], v2[i]] for i in range(count)]


def run_merkle_proof(tree_depth: int = 8, index: int = 42,
                     options: Optional[dict] = None, logger=None):
    stark, field, oracle = make_merkle_stark(options, logger)
    tree = MerkleTree(build_leaves(field, 2 ** tree_depth), oracle)
    branch = tree.prove(index)
    assert MerkleTree.verify(tree.root, index, branch, oracle)

    index_bits = to_binary_array(index, tree_depth)
    index_bits = [0] + index_bits[:-1]
    leaf = branch[0]
    nodes = transpose(branch[1:])
    inputs = [[leaf[0]], [leaf[1]], [nodes[0]], [nodes[1]], [index_bits]]
    T = STEPS * tree_depth
    assertions = [Assertion(step=T - 1, register=0, value=tree.root[0]),
                  Assertion(step=T - 1, register=1, value=tree.root[1])]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions, [[index_bits]]


if __name__ == "__main__":
    stark, proof, assertions = run_hash(3)
    assert stark.verify(assertions, proof)
    print(f"poseidon hash3x128: proof {stark.size_of(proof)} bytes, "
          f"security {stark.security_level}")
    stark, proof, assertions, public = run_merkle_proof(tree_depth=4, index=5)
    assert stark.verify(assertions, proof, public_inputs=public)
    print(f"poseidon merkle d=4: proof {stark.size_of(proof)} bytes, "
          f"security {stark.security_level}")
