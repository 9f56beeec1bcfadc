"""The Stark orchestrator: 8-step prover and 6-step verifier pipelines.

Pipeline-faithful re-derivation of /root/reference/lib/Stark.ts (prover
:81-163, verifier :167-248) on the TPU-native stack: device-batched trace
generation / NTT / hashing / composition / FRI with host-side Fiat-Shamir
and query logic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import math

import jax.numpy as jnp
import numpy as np

from .. import ntt
from ..air.module import AirModule
from ..field.limbs import limbs_to_ints
from ..hash import create_hash
from ..merkle import BatchMerkleProof, MerkleTree
from ..utils import Logger, noop_logger, pow_log2
from .composition import CompositionPolynomial
from .fri import LowDegreeProver, StarkError
from .lincomb import LinearCombination
from .proof import StarkProof
from .queries import QueryIndexGenerator
from .serializer import Serializer
from .sizeof import size_of

DEFAULT_EXE_QUERY_COUNT = 80
DEFAULT_FRI_QUERY_COUNT = 40
MAX_EXE_QUERY_COUNT = 128
MAX_FRI_QUERY_COUNT = 64
HASH_ALGORITHMS = ("sha256", "blake2s256")
DEFAULT_HASH_ALGORITHM = "sha256"


@dataclass
class Assertion:
    """Boundary assertion: trace[register][step] == value
    (/root/reference/genstark.d.ts Assertion)."""
    step: int
    register: int
    value: int


class Stark:
    def __init__(self, air: AirModule, options: Optional[dict] = None,
                 logger: Optional[Logger] = None):
        options = options or {}
        self.air = air

        exe_query_count = options.get("exe_query_count") or DEFAULT_EXE_QUERY_COUNT
        if not (1 <= exe_query_count <= MAX_EXE_QUERY_COUNT):
            raise ValueError(
                f"Execution sample size must be an integer between 1 and {MAX_EXE_QUERY_COUNT}")
        fri_query_count = options.get("fri_query_count") or DEFAULT_FRI_QUERY_COUNT
        if not (1 <= fri_query_count <= MAX_FRI_QUERY_COUNT):
            raise ValueError(
                f"FRI sample size must be an integer between 1 and {MAX_FRI_QUERY_COUNT}")
        hash_algorithm = options.get("hash_algorithm") or DEFAULT_HASH_ALGORITHM
        if hash_algorithm not in HASH_ALGORITHMS:
            raise ValueError(f"Hash algorithm {hash_algorithm} is not supported")

        self.hash = create_hash(hash_algorithm)
        self.index_generator = QueryIndexGenerator(
            air.extension_factor, exe_query_count, fri_query_count)
        self.serializer = Serializer(air.field, air.trace_register_count,
                                     air.secret_input_count, self.hash.digest_size)
        self.logger = logger or noop_logger
        self._fused_cache = {}
        # Multi-chip proving: when a jax.sharding.Mesh is configured (option
        # "mesh" or set_mesh), the fused prover shards the evaluation domain
        # over it — 4-step NTTs with one all-to-all per transform, sharded
        # constraint/composition/fold stages, per-shard Merkle hashing.  The
        # reference has no parallelism at all (SURVEY.md section 2.4); this
        # is the TPU-native scaling axis.  Proof bytes are identical to the
        # single-device path.
        self.mesh = options.get("mesh")

    def set_mesh(self, mesh) -> None:
        """Configure (or clear, with None) the device mesh used by prove()."""
        if mesh is not self.mesh:
            self.mesh = mesh
            self._fused_cache = {}

    # ----- accessors --------------------------------------------------------
    @property
    def security_level(self) -> int:
        ext = self.air.extension_factor
        es = pow_log2(ext / self.air.max_constraint_degree,
                      self.index_generator.exe_query_count)
        fs = math.log2(ext) * self.index_generator.fri_query_count
        hs = self.hash.digest_size * 4
        return int(min(es, fs, hs))

    # ----- prover -----------------------------------------------------------
    def prove(self, assertions: Sequence[Assertion], inputs: Optional[Sequence] = None,
              seed: Optional[Sequence[int]] = None) -> StarkProof:
        """Fused single-program prover (protocol/fused.py): the whole
        pipeline compiles to ONE device program with the Fiat-Shamir
        transcript derived on device; the host only samples query positions
        and gathers proof bytes.  `prove_staged` keeps the stage-by-stage
        pipeline (useful for debugging and step-level logging)."""
        log = self.logger.start("Starting STARK computation")
        if not assertions:
            raise TypeError("At least one assertion must be provided")

        context = self.air.init_proving_context(inputs, seed)
        log("Set up evaluation context")
        try:
            # u16 standard-form limbs [R, L, T] — the native generator's
            # output IS the device upload layout (no host re-layout)
            trace_std = context.generate_execution_trace_u16()
            self._validate_assertions_host(context, trace_std, assertions)
        except StarkError:
            raise
        except Exception as error:
            raise StarkError("Failed to generate the execution trace") from error
        log("Generated execution trace")

        prover = self._fused_prover(context, assertions)
        proof = prover.prove(trace_std)
        log("Computed STARK proof (fused single-program pipeline)")
        self.logger.done(log, "STARK computed")
        return proof

    def _fused_prover(self, context, assertions: Sequence[Assertion]):
        """Cache FusedProver instances per (context shape, assertion
        structure): the compiled program does not depend on input or
        assertion values."""
        from .fused import FusedProver
        key = (context.trace_length, tuple(tuple(s) for s in context.input_shapes),
               tuple((a.step, a.register) for a in assertions))
        cached = self._fused_cache.get(key)
        if cached is not None:
            prover = cached
            # rebind to this context (same shapes -> same program) and refresh
            # the value-dependent host-side pieces (boundary interpolants).
            if prover.context is not context or \
                    [(a.step, a.register, a.value) for a in prover.assertions] != \
                    [(a.step, a.register, a.value) for a in assertions]:
                prover = self._rebuild_fused(prover, context, assertions)
                self._fused_cache[key] = prover
            return prover
        prover = FusedProver(self, context, assertions, mesh=self.mesh)
        self._fused_cache[key] = prover
        return prover

    @staticmethod
    def _rebuild_fused(old, context, assertions):
        from .fused import FusedProver
        new = FusedProver(old.stark, context, assertions, mesh=old.mesh)
        # same structure -> same programs/tables: reuse the compiled jits and
        # the device-resident table pack so a new context/assertion-values
        # never recompiles or re-uploads
        new._jit = old._jit
        new._jit_packed = old._jit_packed
        new._jit_tail = old._jit_tail
        if old._split:
            new._jit_stages = old._jit_stages
        new._packed_gather = old._packed_gather
        new._pack_cache = old._pack_cache
        return new

    def _validate_assertions_host(self, context, trace_std,
                                  assertions: Sequence[Assertion]) -> None:
        """Assertion validation against the host-side trace — no device sync
        (/root/reference/lib/Stark.ts:356-376)."""
        registers, _, steps = trace_std.shape
        for a in assertions:
            if a.register < 0 or a.register >= registers:
                raise ValueError(
                    f"Invalid assertion: register {a.register} is outside of register bank")
            if a.step < 0 or a.step >= steps:
                raise ValueError(
                    f"Invalid assertion: step {a.step} is outside of execution trace")
            v = context.trace_value_host(a.register, a.step)
            if v != a.value % self.air.field.modulus:
                raise StarkError(
                    f"Assertion at step {a.step}, register {a.register} "
                    f"conflicts with execution trace")

    def prove_staged(self, assertions: Sequence[Assertion],
                     inputs: Optional[Sequence] = None,
                     seed: Optional[Sequence[int]] = None) -> StarkProof:
        log = self.logger.start("Starting STARK computation")
        if not assertions:
            raise TypeError("At least one assertion must be provided")
        field = self.air.field
        dev = field.device

        # 1 ----- evaluation context
        context = self.air.init_proving_context(inputs, seed)
        evaluation_domain_size = context.evaluation_domain_size
        log("Set up evaluation context")

        # 2 ----- execution trace
        try:
            execution_trace = context.generate_execution_trace()   # [R, L, T]
            self._validate_assertions(context, execution_trace, assertions)
        except StarkError:
            raise
        except Exception as error:
            raise StarkError("Failed to generate the execution trace") from error
        log("Generated execution trace")

        # 3 ----- P(x) polynomials + low-degree extension
        p_polys = ntt.intt(field, execution_trace)                 # [R, L, T]
        log("Computed execution trace polynomials P(x)")
        p_evaluations = ntt.low_degree_extend(field, p_polys, evaluation_domain_size)
        log("Low-degree extended P(x) polynomials over evaluation domain")

        # 4 ----- evaluation merkle tree over P and S rows
        s_evaluations = context.secret_register_traces             # list [L, Ne]
        e_vectors_std = [dev.from_mont(p_evaluations[r])
                         for r in range(self.air.trace_register_count)]
        e_vectors_std += [dev.from_mont(s) for s in s_evaluations]
        hashed_evaluations = self.hash.merge_element_rows(e_vectors_std,
                                                          field.element_size)
        log("Serialized evaluations of P(x) and S(x) polynomials")
        e_tree = MerkleTree.create(hashed_evaluations, self.hash)
        log("Built evaluation merkle tree")

        # 5 ----- composition polynomial C(x)
        c_logger = self.logger.sub("Computing composition polynomial")
        c_poly = CompositionPolynomial(assertions, e_tree.root, context, c_logger)
        c_evaluations = c_poly.evaluate_all(p_polys, p_evaluations, context)
        self.logger.done(c_logger)
        log("Computed composition polynomial C(x)")

        # 6 ----- random linear combination
        l_combination = LinearCombination(e_tree.root, c_poly.composition_degree,
                                          c_poly.coefficient_count, context)
        l_evaluations = l_combination.compute_many(c_evaluations, p_evaluations,
                                                   s_evaluations)
        log("Combined P(x) and S(x) evaluations with C(x) evaluations")

        # 7 ----- low-degree proof
        try:
            ld_logger = self.logger.sub("Computing low degree proof")
            ld_prover = LowDegreeProver(self.index_generator, self.hash, context,
                                        ld_logger)
            ld_proof = ld_prover.prove(l_evaluations, c_poly.composition_degree)
            self.logger.done(ld_logger)
            log("Computed low-degree proof")
        except StarkError:
            raise
        except Exception as error:
            raise StarkError("Low degree proof failed") from error

        # 8 ----- evaluation tree spot checks
        positions = self.index_generator.get_exe_indexes(
            ld_proof.lc_root, evaluation_domain_size)
        augmented_positions = self._get_augmented_positions(
            positions, evaluation_domain_size)
        e_values = self._merge_values(e_vectors_std, augmented_positions)
        e_proof = e_tree.prove_batch(augmented_positions)
        e_proof.values = e_values
        log(f"Computed {len(positions)} evaluation spot checks")
        self.logger.done(log, "STARK computed")

        return StarkProof(ev_root=e_tree.root, ev_proof=e_proof,
                          ld_proof=ld_proof, i_shapes=context.input_shapes)

    # ----- verifier ---------------------------------------------------------
    def verify(self, assertions: Sequence[Assertion], proof: StarkProof,
               public_inputs: Optional[Sequence] = None) -> bool:
        log = self.logger.start("Starting STARK verification")
        if not assertions:
            raise TypeError("At least one assertion must be provided")
        field = self.air.field
        f = field.host

        # 1 ----- context
        e_root = proof.ev_root
        ext = self.air.extension_factor
        context = self.air.init_verification_context(proof.i_shapes, public_inputs)
        evaluation_domain_size = context.trace_length * ext
        c_poly = CompositionPolynomial(assertions, e_root, context)
        l_combination = LinearCombination(e_root, c_poly.composition_degree,
                                          c_poly.coefficient_count, context)
        log("Set up evaluation context")

        # 2 ----- spot-check positions
        positions = self.index_generator.get_exe_indexes(
            proof.ld_proof.lc_root, evaluation_domain_size)
        augmented_positions = self._get_augmented_positions(
            positions, evaluation_domain_size)
        log("Computed positions for evaluation spot checks")

        # 3 ----- decode evaluation spot-checks
        p_evaluations: Dict[int, List[int]] = {}
        s_evaluations: Dict[int, List[int]] = {}
        for i, merged in enumerate(proof.ev_proof.values):
            position = augmented_positions[i]
            p_vals, s_vals = self._parse_values(merged)
            p_evaluations[position] = p_vals
            s_evaluations[position] = s_vals
        log("Decoded evaluation spot checks")

        # 4 ----- verify evaluation merkle proof
        digests = [self.hash.digest(v) for v in proof.ev_proof.values]
        rehashed = BatchMerkleProof(values=digests, nodes=proof.ev_proof.nodes,
                                    depth=proof.ev_proof.depth)
        if not MerkleTree.verify_batch(e_root, augmented_positions, rehashed,
                                       self.hash):
            raise StarkError("Verification of evaluation Merkle proof failed")
        log("Verified evaluation merkle proof")

        # 5 ----- constraint checks + linear combination values
        # All per-position field inversions — Z(x)^-1 via (x^T - 1)^-1 and
        # the boundary Z_b(x)^-1 — batch into ONE Fermat exponentiation
        # (Montgomery's trick): inversions were >50% of verify time.
        T = context.trace_length
        z = c_poly.z_poly
        xs = [f.exp(context.root_of_unity, step) for step in positions]
        n_b = c_poly.b_poly.count
        dens = []
        for x in xs:
            dens.append(f.sub(f.exp(x, T), 1))            # (x^T - 1)
            dens.extend(c_poly.b_poly.z_dens_at(x))       # Z_b(x) per register
        invs = f.batch_inv(dens)
        lc_values = []
        for i, step in enumerate(positions):
            x = xs[i]
            p_values = p_evaluations[step]
            n_values = p_evaluations[(step + ext) % evaluation_domain_size]
            s_values = s_evaluations[step]
            base = i * (1 + n_b)
            # 1/Z(x) = (x - x_last) / (x^T - 1)
            z_inv = f.mul(f.sub(x, z.x_at_last_step), invs[base])
            c_value = c_poly.evaluate_at(x, p_values, n_values, s_values,
                                         context,
                                         invs=(z_inv,
                                               invs[base + 1:base + 1 + n_b]))
            lc_values.append(l_combination.compute_one(x, c_value, p_values, s_values))
        log("Verified transition and boundary constraints")

        # 6 ----- low-degree proof
        ld_prover = LowDegreeProver(self.index_generator, self.hash, context)
        ld_prover.verify(proof.ld_proof, lc_values, positions,
                         c_poly.composition_degree)
        log("Verified low-degree proof")
        self.logger.done(log, "STARK verified")
        return True

    # ----- utilities --------------------------------------------------------
    def generate_execution_trace(self, inputs=None, seed=None):
        context = self.air.init_proving_context(inputs, seed)
        trace = context.generate_execution_trace()
        return trace, context

    def size_of(self, proof: StarkProof) -> int:
        return size_of(proof, self.air.field.element_size,
                       self.hash.digest_size)["total"]

    def serialize(self, proof: StarkProof) -> bytes:
        return self.serializer.serialize_proof(proof)

    def parse(self, buf: bytes) -> StarkProof:
        return self.serializer.parse_proof(buf)

    # ----- helpers ----------------------------------------------------------
    def _get_augmented_positions(self, positions: List[int],
                                 evaluation_domain_size: int) -> List[int]:
        """pos and (pos+ext) mod N, insertion-ordered dedup
        (/root/reference/lib/Stark.ts:274-282)."""
        skip = self.air.extension_factor
        out = dict()
        for p in positions:
            out[p] = True
            out[(p + skip) % evaluation_domain_size] = True
        return list(out.keys())

    def _merge_values(self, vectors_std: List[jnp.ndarray],
                      positions: List[int]) -> List[bytes]:
        """Leaf bytes at positions: concat of each vector's element
        (/root/reference/lib/Stark.ts:284-296).  One device gather over all
        vectors and positions — no full-domain transfers."""
        elem = self.air.field.element_size
        from .fri import _gather_cols
        idx = jnp.asarray(positions, dtype=jnp.int32)
        picked = np.asarray(_gather_cols(jnp.concatenate(vectors_std, axis=0), idx))
        V = len(vectors_std)
        L = vectors_std[0].shape[0]
        out = []
        for i, _ in enumerate(positions):
            buf = bytearray()
            for v in range(V):
                val = limbs_to_ints(picked[v * L:(v + 1) * L, i:i + 1])[0]
                buf += val.to_bytes(elem, "little")
            out.append(bytes(buf))
        return out

    def _parse_values(self, buf: bytes):
        elem = self.air.field.element_size
        offset = 0
        p_values = []
        for _ in range(self.air.trace_register_count):
            p_values.append(int.from_bytes(buf[offset:offset + elem], "little"))
            offset += elem
        s_values = []
        for _ in range(self.air.secret_input_count):
            s_values.append(int.from_bytes(buf[offset:offset + elem], "little"))
            offset += elem
        return p_values, s_values

    def _validate_assertions(self, context, trace: jnp.ndarray,
                             assertions: Sequence[Assertion]) -> None:
        """(/root/reference/lib/Stark.ts:356-376)"""
        registers, _, steps = trace.shape
        dev = self.air.field.device
        # pull asserted points only
        for a in assertions:
            if a.register < 0 or a.register >= registers:
                raise ValueError(
                    f"Invalid assertion: register {a.register} is outside of register bank")
            if a.step < 0 or a.step >= steps:
                raise ValueError(
                    f"Invalid assertion: step {a.step} is outside of execution trace")
        cols = jnp.stack([trace[a.register, :, a.step] for a in assertions], axis=1)
        values = dev.to_ints(cols)
        for a, v in zip(assertions, values):
            if v != a.value % self.air.field.modulus:
                raise StarkError(
                    f"Assertion at step {a.step}, register {a.register} "
                    f"conflicts with execution trace")
