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


def _nested_shape(values, rank: int) -> List[int]:
    """Shape of a (uniform) nested input list; validates uniformity."""
    if rank == 0:
        return []
    if not isinstance(values, (list, tuple)) or not values:
        raise ValueError("input register requires a non-empty (nested) list")
    if rank == 1:
        return [len(values)]
    sub = [_nested_shape(v, rank - 1) for v in values]
    if any(s != sub[0] for s in sub):
        raise ValueError("nested input lists must be uniform")
    return [len(values)] + sub[0]


def _flatten(values, rank: int) -> List:
    if rank <= 1:
        return list(values)
    out = []
    for v in values:
        out.extend(_flatten(v, rank - 1))
    return out


def compute_input_layout(schema: AirSchema, shapes: Sequence[Sequence[int]]):
    """Given per-input-register shapes (iShapes), derive each register's value
    span and the trace length.  Span rules documented on InputRegister."""
    input_regs = schema.input_registers
    if len(shapes) != len(input_regs):
        raise ValueError("input shape count mismatch")
    shape_of = {k: list(shapes[slot]) for slot, k in enumerate(input_regs)}
    children: Dict[int, List[int]] = {}
    for k in input_regs:
        reg = schema.static_registers[k]
        if len(shape_of[k]) != reg.rank:
            raise ValueError(
                f"input register {k}: shape rank {len(shape_of[k])} != declared rank {reg.rank}")
        if reg.parent is not None:
            children.setdefault(reg.parent, []).append(k)
        if reg.peer is not None and shape_of[k] != shape_of[reg.peer]:
            raise ValueError(f"peer input registers {k} and {reg.peer} must share shape")

    spans: Dict[int, int] = {}

    def span(k: int) -> int:
        if k in spans:
            return spans[k]
        reg = schema.static_registers[k]
        if reg.steps is not None:
            s = reg.steps
        elif reg.peer is not None:
            s = span(reg.peer)
        elif children.get(k):
            c0 = children[k][0]
            for c in children[k][1:]:
                if shape_of[c][-1] != shape_of[c0][-1]:
                    raise ValueError("sibling child inputs must share the last dimension")
            s = shape_of[c0][-1] * span(c0)
        else:
            s = schema.base_steps
        spans[k] = s
        return s

    totals = {}
    trace_length = schema.base_steps if not input_regs else None
    for k in input_regs:
        reg = schema.static_registers[k]
        if reg.parent is not None and \
                shape_of[k][:-1] != shape_of[reg.parent]:
            raise ValueError(
                f"child input {k} shape must extend parent {reg.parent} shape")
        n = 1
        for d in shape_of[k]:
            n *= d
        totals[k] = n
        t = n * span(k)
        if trace_length is None:
            trace_length = t
        elif t != trace_length:
            raise ValueError(
                f"inconsistent input spans: register {k} implies trace length {t}, "
                f"others imply {trace_length}")
    return trace_length, spans, totals


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
    def _cyclic_pattern(self, k: int) -> Optional[List[int]]:
        """Periodic pattern for register k if it is cyclic-like (cycle/mask).
        Mask period = the source input register's value span."""
        reg = self.schema.static_registers[k]
        if isinstance(reg, CyclicRegister):
            return [v % self.field.modulus for v in reg.values]
        if isinstance(reg, MaskRegister):
            span = self.input_spans[reg.source]
            src = self.schema.static_registers[reg.source]
            pattern = [0] * span
            # the mask is aligned with the *shifted* source column: with
            # (shift -1) the next cycle's value becomes visible at the last
            # step of the current cycle, and the mask fires there too — this
            # is what lets the transition at the last step of a cycle compute
            # the next cycle's init value (lib128.aa ComputeMerkleRoot:
            # transition combines init/round terms via these masks).
            pattern[src.shift % span] = 1
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
        self.input_values: Dict[int, List[int]] = {}
        self.input_shapes: List[List[int]] = []
        for slot, k in enumerate(input_regs):
            reg: InputRegister = schema.static_registers[k]
            shape = _nested_shape(inputs[slot], reg.rank)
            values = [int(v) % schema.field.modulus
                      for v in _flatten(inputs[slot], reg.rank)]
            if reg.binary and any(v not in (0, 1) for v in values):
                raise ValueError("binary input register requires 0/1 values")
            self.input_values[k] = values
            self.input_shapes.append(shape)
        trace_length, self.input_spans, _ = compute_input_layout(
            schema, self.input_shapes)
        super().__init__(module, trace_length)
        self.seed = [int(s) % self.field.modulus for s in seed]
        self._trace = None
        self._trace_std = None
        self._trace_u16 = None

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
                span = self.input_spans[k]
                expanded = [v for v in values for _ in range(span)]
                if len(expanded) != T:
                    raise ValueError("input register span does not match trace length")
                if reg.shift:
                    # col[t] = expanded[(t - shift) mod T]: shift -1 makes the
                    # next cycle's value visible one step early
                    s = (-reg.shift) % T
                    expanded = expanded[s:] + expanded[:s] if s else expanded
                cols.append(expanded)
            else:
                raise TypeError(f"unknown static register {type(reg)}")
        return cols

    def static_column_limbs(self, k: int, L: int) -> np.ndarray:
        """Standard-form 16-bit limbs [L, T] of static column k, built
        STRUCTURALLY (distinct values converted once, then numpy
        repeat/tile/roll) — a column at 2^20 steps holds a million python
        ints but only a handful of distinct values, and per-prove big-int
        conversion of the full column was the dominant host-prep cost."""
        from ..field.limbs import ints_to_limbs
        T = self.trace_length
        reg = self.schema.static_registers[k]
        pattern = self._cyclic_pattern(k)
        if pattern is not None:
            base = ints_to_limbs(pattern, L)                # [L, ell]
            return np.tile(base, (1, T // len(pattern)))
        if isinstance(reg, InputRegister):
            base = ints_to_limbs(self.input_values[k], L)   # [L, n_vals]
            col = np.repeat(base, self.input_spans[k], axis=1)
            if col.shape[1] != T:
                raise ValueError("input register span does not match trace length")
            # col[t] = expanded[(t - shift) mod T]
            return np.roll(col, reg.shift, axis=1) if reg.shift else col
        return ints_to_limbs(self.static_columns[k], L)

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
        leaf/node masks select between init and transition behavior).

        The recurrence is inherently serial over tiny per-step state, so it
        runs as code-generated host arithmetic (the reference's generated-JS
        equivalent) and the finished trace ships to the device in one
        transfer; all batched domain-wide stages stay on the TPU.  A device
        lax.scan variant is kept for cases where the trace must be produced
        on-device (see _generate_execution_trace_device).
        """
        if self._trace is not None:
            return self._trace
        std = self.generate_execution_trace_std()           # np [R, L, T]
        dev = self.field.device
        R, L, T = std.shape
        flat = np.ascontiguousarray(std.transpose(1, 0, 2).reshape(L, R * T))
        mont = dev.to_mont(jnp.asarray(flat))               # [L, R*T]
        self._trace = mont.reshape(L, R, T).transpose(1, 0, 2)
        return self._trace

    def generate_execution_trace_std(self) -> np.ndarray:
        """Host-side trace as standard-form limbs, np.uint32 [R, L, T]."""
        if self._trace_std is not None:
            return self._trace_std
        self._trace_std = self.generate_execution_trace_u16().astype(np.uint32)
        return self._trace_std

    def generate_execution_trace_u16(self) -> np.ndarray:
        """Host-side trace as standard-form 16-bit limbs, np.uint16
        [R, L, T] — the fused prover's device upload format
        (protocol/fused.py _put16): the native generator emits this layout
        directly, so the hot path has zero host-side re-layout between the
        recurrence and the transfer."""
        if self._trace_u16 is not None:
            return self._trace_u16
        u16 = self._generate_trace_native()
        if u16 is None:
            u16 = self._generate_trace_pyhost().astype(np.uint16)
        self._trace_u16 = u16
        return u16

    def trace_value_host(self, register: int, step: int) -> Optional[int]:
        """Standard-form python int at (register, step) from the host trace,
        or None if only a device trace exists."""
        if self._trace_u16 is None and self._trace_std is None:
            return None
        from ..field.limbs import limbs_to_ints
        src = self._trace_std if self._trace_std is not None else self._trace_u16
        col = src[register, :, step:step + 1].astype(np.uint32)
        return limbs_to_ints(col)[0]

    def _statics_struct(self):
        """Pattern-compressed static columns for the native generator:
        per register (values, span, start_pos) with column[t] =
        values[((t + start_pos) mod (len*span)) / span].  None when some
        register type has no compressed form (then full columns are used)."""
        T = self.trace_length
        out = []
        for k, reg in enumerate(self.schema.static_registers):
            pattern = self._cyclic_pattern(k)
            if pattern is not None:
                out.append((pattern, 1, 0))
            elif isinstance(reg, InputRegister):
                span = self.input_spans[k]
                if len(self.input_values[k]) * span != T:
                    # same invariant static_columns/static_column_limbs raise
                    # on; the native stream would silently wrap at len*span
                    raise ValueError("input register span does not match trace length")
                # col[t] = expanded[(t - shift) mod T], expanded=repeat(values, span)
                out.append((self.input_values[k], span,
                            (-reg.shift) % T if reg.shift else 0))
            else:
                return None
        return out

    def _generate_trace_native(self) -> Optional[np.ndarray]:
        """Code-generated C++ recurrence (genstark_tpu.native): returns the
        u16 [R, L, T] upload layout, or None on any toolchain/codegen
        failure so the Python interpreter takes over."""
        schema = self.schema
        try:
            from ..native import native_trace_fn
            run = native_trace_fn(schema.init, schema.transition,
                                  self.field.modulus, len(self.seed),
                                  len(schema.static_registers))
            struct = self._statics_struct()
            cols = self.static_columns if struct is None else None
            out = run(cols, self.seed, self.trace_length,
                      statics_struct=struct)
        except Exception:
            return None
        return out[:, :self.field.device.L, :]

    def _generate_trace_pyhost(self) -> np.ndarray:
        from .ir import compile_host_fn
        from ..field.limbs import ints_to_limbs
        schema = self.schema
        p = self.field.modulus
        T = self.trace_length
        R = schema.trace_width
        init_fn = compile_host_fn(schema.init, p)
        step_fn = compile_host_fn(schema.transition, p)
        cols = self.static_columns                          # [K][T] ints
        K = len(cols)
        statics = [[cols[k][t] for k in range(K)] for t in range(T)] if K \
            else [[]] * T
        state = init_fn([0] * R, statics[0], self.seed)
        rows = [state]
        for t in range(T - 1):
            state = step_fn(state, statics[t])
            rows.append(state)
        L = self.field.device.L
        flat = [rows[t][r] for r in range(R) for t in range(T)]
        return np.asarray(ints_to_limbs(flat, L)).reshape(L, R, T).transpose(1, 0, 2)

    def _generate_execution_trace_device(self) -> jnp.ndarray:
        """Device lax.scan trace generation (used when the trace should be
        produced on-device, e.g. sharded/batched scenarios)."""
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

        # unrolling amortizes per-iteration scan overhead, but the traced body
        # size scales with the transition DAG — keep the product bounded so
        # wide AIRs (e.g. Poseidon Merkle, ~400 field ops/step) still compile
        from .ir import count_nodes
        body_ops = count_nodes(schema.transition)
        unroll = max(1, min(8, 64 // max(1, body_ops // 8)))

        def run(statics_t):
            state0 = step0(statics_t[0])
            _, states = jax.lax.scan(body, state0, statics_t[:-1], unroll=unroll)
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

        run = jax.jit(lambda p, n, s: self.evaluate_transition_constraints_traced(p, n, s))
        return run(p_evals, n_evals, static_evals)

    def evaluate_transition_constraints_traced(self, p_evals, n_evals,
                                               static_evals) -> jnp.ndarray:
        """Traceable constraint-DAG evaluation over any domain: p_evals /
        n_evals [R, L, N], static_evals list of [L, N] — all Montgomery.
        Used both by evaluate_transition_constraints and the fused prover."""
        schema = self.schema
        dev = self.field.device
        env = {"dev": dev, "ndim": 1,
               "trace": [p_evals[r] for r in range(schema.trace_width)],
               "next": [n_evals[r] for r in range(schema.trace_width)],
               "static": list(static_evals)}
        cache = {}
        return jnp.stack([eval_device(c, env, cache) for c in schema.constraints])


class VerificationContext(_ContextBase):
    def __init__(self, module: AirModule, input_shapes: Sequence[Sequence[int]],
                 public_inputs: Sequence):
        schema = module.schema
        input_regs = schema.input_registers
        public_regs = [k for k in input_regs
                       if not schema.static_registers[k].secret]
        if len(public_inputs) != len(public_regs):
            raise ValueError(
                f"expected {len(public_regs)} public inputs, got {len(public_inputs)}")
        self.input_shapes = [list(s) for s in input_shapes]
        trace_length, self.input_spans, counts = compute_input_layout(
            schema, self.input_shapes)
        super().__init__(module, trace_length)
        self._input_counts = counts
        self.public_input_values: Dict[int, List[int]] = {}
        for slot, k in enumerate(public_regs):
            reg: InputRegister = schema.static_registers[k]
            values = [int(v) % self.field.modulus
                      for v in _flatten(public_inputs[slot], reg.rank)]
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
                span = self.input_spans[k]
                expanded = [v for v in values for _ in range(span)]
                if reg.shift:
                    s = (-reg.shift) % T
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
