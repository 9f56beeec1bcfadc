"""AIR module + proving/verification contexts.

TPU-native replacement for air-assembly's `instantiate(schema, component,
{extensionFactor, wasmOptions})` (/root/reference/lib/Stark.ts:40) and the
contexts it returns (`initProvingContext` / `initVerificationContext`,
/root/reference/lib/Stark.ts:90,177).

Domain conventions (identical to the reference's, SURVEY.md section 3.2):
  execution domain   size T            root w_t = w^ext
  composition domain size T*cf         root w_c = w^(ext/cf)
  evaluation domain  size T*ext        root w  ("context.rootOfUnity")
with cf = 2^ceil(log2(max constraint degree)).
"""

from __future__ import annotations

import math
from functools import cached_property
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import ntt
from ..field import PrimeField
from .ir import (AirSchema, CyclicRegister, InputRegister, MaskRegister,
                 eval_device, eval_host)


def default_extension_factor(max_degree: int) -> int:
    """Smallest power of 2 strictly greater than 2*maxDegree (README.md:112)."""
    e = 2
    while e <= 2 * max_degree:
        e *= 2
    return e


def composition_factor(max_degree: int) -> int:
    return max(1, 1 << (max_degree - 1).bit_length()) if max_degree > 1 else 1


class AirModule:
    def __init__(self, schema: AirSchema, extension_factor: Optional[int] = None):
        self.schema = schema
        self.field: PrimeField = schema.field
        maxdeg = schema.max_constraint_degree
        self.max_constraint_degree = maxdeg
        self.composition_factor = composition_factor(maxdeg)
        ext = extension_factor or default_extension_factor(maxdeg)
        if ext & (ext - 1) or ext < 2:
            raise ValueError("extension factor must be a power of 2, at least 2")
        if ext < 2 * self.composition_factor and ext < 2 * maxdeg:
            pass  # reference only requires ext to cover constraint degree via
        if ext > 32:
            raise ValueError("extension factor cannot be greater than 32")
        self.extension_factor = ext

    # surface mirroring the reference AirModule (lib/Stark.ts:63-67,302-307)
    @property
    def trace_register_count(self) -> int:
        return self.schema.trace_width

    @property
    def secret_input_count(self) -> int:
        return self.schema.secret_input_count

    def init_proving_context(self, inputs: Optional[Sequence] = None,
                             seed: Optional[Sequence[int]] = None) -> "ProvingContext":
        return ProvingContext(self, inputs or [], list(seed or []))

    def init_verification_context(self, input_shapes: Sequence[Sequence[int]],
                                  public_inputs: Optional[Sequence] = None
                                  ) -> "VerificationContext":
        return VerificationContext(self, input_shapes, public_inputs or [])


class _ContextBase:
    """Shared domain bookkeeping for proving and verification contexts."""

    def __init__(self, module: AirModule, trace_length: int):
        self.module = module
        self.field = module.field
        schema = module.schema
        self.schema = schema
        ext = module.extension_factor
        cf = module.composition_factor
        if trace_length < 2 or trace_length & (trace_length - 1):
            raise ValueError("trace length must be a power of 2, at least 2")
        self.trace_length = trace_length
        self.extension_factor = ext
        self.evaluation_domain_size = trace_length * ext
        self.composition_domain_size = trace_length * cf
        # "rootOfUnity" in the reference = generator of the evaluation domain
        self.root_of_unity = self.field.get_root_of_unity(self.evaluation_domain_size)

    @property
    def constraints(self):
        return self.schema.constraints

    @property
    def constraint_degrees(self) -> List[int]:
        return self.schema.constraint_degrees

    # ----- static register column helpers (host int arrays) -----------------
    def _input_cycle_steps(self, reg: InputRegister) -> int:
        return reg.steps or self.schema.base_steps

    def _cyclic_pattern(self, k: int) -> Optional[List[int]]:
        """Periodic pattern for register k if it is cyclic-like (cycle/mask)."""
        reg = self.schema.static_registers[k]
        if isinstance(reg, CyclicRegister):
            return [v % self.field.modulus for v in reg.values]
        if isinstance(reg, MaskRegister):
            src = self.schema.static_registers[reg.source]
            steps = self._input_cycle_steps(src)
            pattern = [0] * steps
            pattern[0] = 1
            if reg.inverted:
                pattern = [1 - v for v in pattern]
            return pattern
        return None


class ProvingContext(_ContextBase):
    def __init__(self, module: AirModule, inputs: Sequence, seed: List[int]):
        schema = module.schema
        input_regs = schema.input_registers
        if len(inputs) != len(input_regs):
            raise ValueError(
                f"expected inputs for {len(input_regs)} input registers, got {len(inputs)}")
        # expand inputs -> value lists + shapes; derive trace length
        self.input_values: Dict[int, List[int]] = {}
        self.input_shapes: List[List[int]] = []
        trace_length = schema.base_steps
        for slot, k in enumerate(input_regs):
            reg: InputRegister = schema.static_registers[k]
            if reg.rank != 1 or reg.parent is not None:
                raise NotImplementedError("nested/ranked inputs land with the AirScript frontend")
            values = [int(v) % schema.field.modulus for v in inputs[slot]]
            if not values:
                raise ValueError("input register requires at least one value")
            if reg.binary and any(v not in (0, 1) for v in values):
                raise ValueError("binary input register requires 0/1 values")
            self.input_values[k] = values
            self.input_shapes.append([len(values)])
            span = len(values) * (reg.steps or schema.base_steps)
            trace_length = max(trace_length, span)
        super().__init__(module, trace_length)
        self.seed = [int(s) % self.field.modulus for s in seed]
        self._trace = None

    # ----- static columns ----------------------------------------------------
    @cached_property
    def static_columns(self) -> List[List[int]]:
        """Per static register: the full column of T standard-form ints."""
        T = self.trace_length
        cols = []
        for k, reg in enumerate(self.schema.static_registers):
            pattern = self._cyclic_pattern(k)
            if pattern is not None:
                if len(pattern) > T:
                    raise ValueError(
                        f"cyclic register {k} period {len(pattern)} exceeds trace length {T}")
                cols.append(pattern * (T // len(pattern)))
            elif isinstance(reg, InputRegister):
                values = self.input_values[k]
                steps = self._input_cycle_steps(reg)
                expanded = [v for v in values for _ in range(steps)]
                if len(expanded) != T:
                    raise ValueError("input register span does not match trace length")
                if reg.shift:
                    s = reg.shift % T
                    expanded = expanded[s:] + expanded[:s] if s else expanded
                cols.append(expanded)
            else:
                raise TypeError(f"unknown static register {type(reg)}")
        return cols

    @cached_property
    def static_device(self) -> jnp.ndarray:
        """[K, L, T] Montgomery device array of static columns (K may be 0)."""
        dev = self.field.device
        K = len(self.schema.static_registers)
        if K == 0:
            return jnp.zeros((0, dev.L, self.trace_length), dtype=jnp.uint32)
        return jnp.stack([dev.from_ints(c) for c in self.static_columns])

    # ----- execution trace ---------------------------------------------------
    def generate_execution_trace(self) -> jnp.ndarray:
        """Run the AIR: returns [R, L, T] Montgomery trace on device.

        Equivalent of the generated `generateExecutionTrace`
        (/root/reference/lib/Stark.ts:97).  The init expressions run only at
        step 0 — per AirAssembly semantics, cycle re-initialization for
        multi-value inputs is encoded by the transition itself via mask
        registers (see /root/reference/assembly/lib128.aa:143-151, where the
        leaf/node masks select between init and transition behavior).  The
        sequential dependency is a lax.scan over steps.
        """
        if self._trace is not None:
            return self._trace
        schema = self.schema
        dev = self.field.device
        T = self.trace_length
        R = schema.trace_width

        seed_env = [dev.const(s) for s in self.seed]
        statics = self.static_device                       # [K, L, T]
        statics_t = jnp.transpose(statics, (2, 1, 0)) if statics.shape[0] else \
            jnp.zeros((T, dev.L, 0), dtype=jnp.uint32)     # [T, L, K]

        def static_env(arr):                               # arr: [L, K]
            return [arr[:, k] for k in range(len(schema.static_registers))]

        def step0(statics_0):
            env = {"dev": dev, "ndim": 0,
                   "trace": [dev.zeros(()) for _ in range(R)],
                   "static": static_env(statics_0), "seed": seed_env}
            cache = {}
            return jnp.stack([eval_device(e, env, cache) for e in schema.init], axis=1)

        def body(state, statics_step):
            cols = [state[:, r] for r in range(R)]
            env = {"dev": dev, "ndim": 0, "trace": cols,
                   "static": static_env(statics_step)}
            cache = {}
            nxt = jnp.stack([eval_device(e, env, cache) for e in schema.transition],
                            axis=1)
            return nxt, nxt

        def run(statics_t):
            state0 = step0(statics_t[0])
            _, states = jax.lax.scan(body, state0, statics_t[:-1])
            return jnp.concatenate([state0[None], states], axis=0)   # [T, L, R]

        trace = jax.jit(run)(statics_t)
        self._trace = jnp.transpose(trace, (2, 1, 0))             # [R, L, T]
        return self._trace

    # ----- secret register traces (committed with P evals) -------------------
    @cached_property
    def secret_register_traces(self) -> List[jnp.ndarray]:
        """LDE evaluations over the evaluation domain per secret input register
        ([L, Ne] Montgomery each) — `context.secretRegisterTraces`
        (/root/reference/lib/Stark.ts:113)."""
        out = []
        for k in self.schema.secret_input_registers:
            col = self.field.device.from_ints(self.static_columns[k])
            coeffs = ntt.intt(self.field, col)
            out.append(ntt.low_degree_extend(self.field, coeffs,
                                             self.evaluation_domain_size))
        return out

    # ----- transition constraint evaluation over the composition domain ------
    def evaluate_transition_constraints(self, p_polys: jnp.ndarray) -> jnp.ndarray:
        """p_polys: [R, L, T] coefficient form -> [C, L, Nc] constraint evals.

        Equivalent of the generated `evaluateTransitionConstraints`
        (/root/reference/lib/components/CompositionPolynomial.ts:76)."""
        schema = self.schema
        dev = self.field.device
        Nc = self.composition_domain_size
        cf = Nc // self.trace_length

        p_evals = ntt.low_degree_extend(self.field, p_polys, Nc)   # [R, L, Nc]
        n_evals = jnp.roll(p_evals, -cf, axis=-1)
        static_evals = []
        for k in range(len(schema.static_registers)):
            col = dev.from_ints(self.static_columns[k])
            coeffs = ntt.intt(self.field, col)
            static_evals.append(ntt.low_degree_extend(self.field, coeffs, Nc))

        def run(p_evals, n_evals, static_evals):
            env = {"dev": dev, "ndim": 1,
                   "trace": [p_evals[r] for r in range(schema.trace_width)],
                   "next": [n_evals[r] for r in range(schema.trace_width)],
                   "static": static_evals}
            cache = {}
            return jnp.stack([eval_device(c, env, cache) for c in schema.constraints])

        return jax.jit(run)(p_evals, n_evals, static_evals)


class VerificationContext(_ContextBase):
    def __init__(self, module: AirModule, input_shapes: Sequence[Sequence[int]],
                 public_inputs: Sequence):
        schema = module.schema
        input_regs = schema.input_registers
        if len(input_shapes) != len(input_regs):
            raise ValueError("input shape count mismatch")
        public_regs = [k for k in input_regs
                       if not schema.static_registers[k].secret]
        if len(public_inputs) != len(public_regs):
            raise ValueError(
                f"expected {len(public_regs)} public inputs, got {len(public_inputs)}")
        trace_length = schema.base_steps
        self.input_shapes = [list(s) for s in input_shapes]
        counts: Dict[int, int] = {}
        for slot, k in enumerate(input_regs):
            reg: InputRegister = schema.static_registers[k]
            n = 1
            for d in input_shapes[slot]:
                n *= d
            counts[k] = n
            trace_length = max(trace_length, n * (reg.steps or schema.base_steps))
        super().__init__(module, trace_length)
        self._input_counts = counts
        self.public_input_values: Dict[int, List[int]] = {}
        for slot, k in enumerate(public_regs):
            values = [int(v) % self.field.modulus for v in public_inputs[slot]]
            if len(values) != counts[k]:
                raise ValueError("public input length does not match input shape")
            self.public_input_values[k] = values

    # ----- static register evaluation at a point -----------------------------
    @cached_property
    def _static_evaluators(self):
        """Per static register: either ('secret', slot) or a host callable x->value."""
        f = self.field.host
        T = self.trace_length
        evaluators = []
        secret_slot = 0
        for k, reg in enumerate(self.schema.static_registers):
            pattern = self._cyclic_pattern(k)
            if isinstance(reg, InputRegister) and reg.secret:
                evaluators.append(("secret", secret_slot))
                secret_slot += 1
                continue
            if pattern is not None:
                ell = len(pattern)
                coeffs = f.interpolate_roots(pattern) if ell > 1 else list(pattern)
                power = T // ell

                def make_cyclic(coeffs=coeffs, power=power):
                    return lambda x: f.eval_poly_at(coeffs, f.exp(x, power))
                evaluators.append(("eval", make_cyclic()))
            else:
                # public input register: interpolate the full expanded column
                values = self.public_input_values[k]
                steps = self._input_cycle_steps(reg)
                expanded = [v for v in values for _ in range(steps)]
                if reg.shift:
                    s = reg.shift % T
                    expanded = expanded[s:] + expanded[:s]
                coeffs = f.interpolate_roots(expanded)

                def make_full(coeffs=coeffs):
                    return lambda x: f.eval_poly_at(coeffs, x)
                evaluators.append(("eval", make_full()))
        return evaluators

    def evaluate_constraints_at(self, x: int, p_values: List[int],
                                n_values: List[int], s_values: List[int]) -> List[int]:
        """Single-point constraint evaluation (host) — the generated
        `evaluateConstraintsAt` (/root/reference/lib/components/CompositionPolynomial.ts:153).
        s_values are the committed secret-register values from the proof."""
        static_vals = []
        for kind, payload in self._static_evaluators:
            if kind == "secret":
                static_vals.append(s_values[payload])
            else:
                static_vals.append(payload(x))
        env = {"field": self.field.host, "trace": p_values, "next": n_values,
               "static": static_vals}
        cache = {}
        return [eval_host(c, env, cache) for c in self.schema.constraints]
