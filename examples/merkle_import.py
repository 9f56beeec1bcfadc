"""AirScript programs that import AirAssembly components:

- merkle_proof — /root/reference/examples/assembly/merkleProof.ts:38-77:
  `import { ComputePoseidonHash as Hash }` and dual `with $r[..] yield
  Hash(...)` lanes over a Merkle branch (6 regs x 64*depth steps, p224).
- merkle_update — /root/reference/examples/assembly/merkleUpdate.ts:36-58:
  whole-body re-export of ComputeMerkleUpdate under AirScript input
  declarations (12 regs, 13 constraints incl. the bit-ness check).
"""

from __future__ import annotations

from typing import List, Optional

from genstark_tpu import instantiate_script
from genstark_tpu.protocol import Assertion

from .assembly_lib import STEPS, poseidon_oracle
from .poseidon_utils import MerkleTree2, to_binary_array

# No filesystem path: the `'../assembly/lib*.aa'` imports resolve to the
# framework's own generated stdlib (genstark_tpu/stdlib), so these examples
# run without the reference checkout.  Point this at a directory to use
# on-disk `.aa` sources instead.
ASSEMBLY_DIR = None

OPTIONS = {                          # merkleProof.ts:30-36
    "hash_algorithm": "blake2s256",
    "extension_factor": 32,
    "exe_query_count": 44,
    "fri_query_count": 20,
}

MERKLE_PROOF_SRC = """
import { ComputePoseidonHash as Hash } from '../assembly/lib224.aa';

define MerkleBranch over prime field (2^224 - 2^96 + 1) {

    secret input leaf       : element[1];
    secret input node       : element[1][1];
    public input indexBit   : boolean[1][1];

    transition 6 registers {
        for each (leaf, node, indexBit) {
            init {
                s1 <- [leaf, node, 0];
                s2 <- [node, leaf, 0];
                yield [...s1, ...s2];
            }
            for each (node, indexBit) {
                h <- indexBit ? $r3 : $r0;
                with $r[0..2] yield Hash(h, node);
                with $r[3..5] yield Hash(node, h);
            }
        }
    }

    enforce 6 constraints {
        for all steps {
            enforce transition($r) = $n;
        }
    }
}"""

MERKLE_UPDATE_SRC = """
import { ComputeMerkleUpdate } from '../assembly/lib224.aa';

define MerkleBranch over prime field (2^224 - 2^96 + 1) {

    secret input oldLeaf    : element[1];
    secret input newLeaf    : element[1];
    secret input authPath   : element[1][1];
    secret input indexBits  : boolean[1][1];

    transition 12 registers {
        for each (oldLeaf, newLeaf, authPath, indexBits) {
            yield ComputeMerkleUpdate(oldLeaf, newLeaf, authPath, indexBits);
        }
    }

    enforce 13 constraints {
        for each (oldLeaf, newLeaf, authPath, indexBits) {
            enforce ComputeMerkleUpdate(oldLeaf, newLeaf, authPath, indexBits);
        }
    }
}"""


def make_merkle_proof_stark(options: Optional[dict] = None, logger=None):
    return instantiate_script(MERKLE_PROOF_SRC, options or dict(OPTIONS),
                              logger, base_path=ASSEMBLY_DIR)


def make_merkle_update_stark(options: Optional[dict] = None, logger=None):
    return instantiate_script(MERKLE_UPDATE_SRC, options or dict(OPTIONS),
                              logger, base_path=ASSEMBLY_DIR)


def run_merkle_proof(tree_depth: int = 8, index: int = 42,
                     options: Optional[dict] = None, logger=None):
    """merkleProof.ts:80-108: prove membership of `index` in a random tree."""
    field, oracle = poseidon_oracle("224")
    stark = make_merkle_proof_stark(options, logger)
    tree = MerkleTree2(field.prng(b"\x2a", 2 ** tree_depth), oracle)
    branch = tree.prove(index)
    bits = [0] + to_binary_array(index, tree_depth)[:-1]
    inputs = [[branch[0]], [branch[1:]], [bits]]
    T = STEPS * tree_depth
    assertions = [Assertion(step=T - 1, register=0, value=tree.root)]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions, [[bits]]


def run_merkle_update(tree_depth: int = 8, index: int = 42,
                      old_value: int = 9, new_value: int = 11,
                      options: Optional[dict] = None, logger=None):
    """merkleUpdate.ts:60-101: prove a leaf update links the two roots."""
    field, oracle = poseidon_oracle("224")
    stark = make_merkle_update_stark(options, logger)
    leaves1 = field.prng(b"\x51", 2 ** tree_depth)
    leaves1[index] = old_value
    tree1 = MerkleTree2(leaves1, oracle)
    branch1 = tree1.prove(index)
    leaves2 = list(leaves1)
    leaves2[index] = new_value
    tree2 = MerkleTree2(leaves2, oracle)
    branch2 = tree2.prove(index)

    bits = [0] + to_binary_array(index, tree_depth)[:-1]
    inputs = [[branch1[0]], [branch2[0]], [branch1[1:]], [bits]]
    T = STEPS * tree_depth
    assertions = [Assertion(step=T - 1, register=0, value=tree1.root),
                  Assertion(step=T - 1, register=6, value=tree2.root)]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions


if __name__ == "__main__":
    stark, proof, assertions, public = run_merkle_proof(tree_depth=4, index=5)
    assert stark.verify(assertions, proof, public_inputs=public)
    print(f"merkle proof (import): {stark.size_of(proof)} bytes")
    stark, proof, assertions = run_merkle_update(tree_depth=4, index=5)
    assert stark.verify(assertions, proof)
    print(f"merkle update (import): {stark.size_of(proof)} bytes")
