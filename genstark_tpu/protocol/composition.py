"""Composition polynomial C(x) = D(x) + B(x).

Faithful re-derivation of /root/reference/lib/components/CompositionPolynomial.ts:
evaluate transition constraints Q over the composition domain, degree-adjust
per degree group, random-linear-combine with PRNG coefficients seeded by the
evaluation-tree root, LDE to the evaluation domain, divide by Z(x), add
degree-adjusted boundary quotients.  The prover path is device-batched; the
verifier path is host scalar math.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp

from .. import ntt
from .boundary import BoundaryConstraints
from .zeropoly import ZeroPolynomial


def get_combination_degree(constraint_degrees: List[int], trace_length: int) -> int:
    max_degree = max([1] + list(constraint_degrees))
    return (1 << (max_degree - 1).bit_length() if max_degree > 1 else 1) * trace_length


def group_transition_constraints(constraint_degrees: List[int], trace_length: int):
    """Group constraint indexes by degree*traceLength, insertion-ordered
    (CompositionPolynomial.ts:206-225)."""
    groups = {}
    for i, d in enumerate(constraint_degrees):
        groups.setdefault(d * trace_length, []).append(i)
    return [{"degree": degree, "indexes": idxs} for degree, idxs in groups.items()]


def _transform(field, x, n, w_table, panel=None, mxu=None):
    """Tables-path transform: prefers the MXU multi-level bundle, then the
    precomputed 4-step twiddle panel, when the enclosing prover shipped one
    as a program parameter."""
    if mxu is not None:
        return ntt.mxu_transform_core(field, x, n, mxu)
    if panel is not None:
        return ntt._four_step_core(field, x, n, w_table, panel=panel)
    return ntt.ntt_core_table(field, x, n, w_table)


class CompositionPolynomial:
    def __init__(self, assertions, seed: bytes, context, logger=None):
        self.field = context.field
        self.context = context
        self.log = logger or (lambda msg: None)
        self.b_poly = BoundaryConstraints(assertions, context)
        self.z_poly = ZeroPolynomial(context)

        degrees = context.constraint_degrees
        T = context.trace_length
        self.combination_degree = get_combination_degree(degrees, T)
        self.composition_degree = max(self.combination_degree - T, T)
        self.constraint_groups = group_transition_constraints(degrees, T)

        d_coefficient_count = len(degrees)
        for group in self.constraint_groups:
            if group["degree"] < self.combination_degree:
                d_coefficient_count += len(group["indexes"])
        b_coefficient_count = self.b_poly.count
        if self.composition_degree > T:
            b_coefficient_count *= 2
        self.d_coefficient_count = d_coefficient_count
        self.b_coefficient_count = b_coefficient_count

        # seed=None builds the structure only (counts, groups, degrees) —
        # the fused prover derives the coefficients on device from the same
        # transcript stream (protocol/fused.py).
        if seed is not None:
            coefficients = self.field.prng(seed,
                                           d_coefficient_count + b_coefficient_count)
            self.d_coefficients = coefficients[:d_coefficient_count]
            self.b_coefficients = coefficients[d_coefficient_count:]
        else:
            self.d_coefficients = None
            self.b_coefficients = None

    @property
    def coefficient_count(self) -> int:
        return self.d_coefficient_count + self.b_coefficient_count

    # ----- prover path ------------------------------------------------------
    def evaluate_all(self, p_polys: jnp.ndarray, p_evaluations: jnp.ndarray,
                     context, d_coeffs_mont=None, b_coeffs_mont=None,
                     b_ipolys_mont=None, q_evals=None, tables=None) -> jnp.ndarray:
        """p_polys: [R, L, T] coefficients; p_evaluations: unused (kept for
        the staged caller's signature).  Returns C(x) evaluations [L, Ne] in
        the representation implied by the coefficient arrays: Montgomery
        for the staged path (python-int coefficients), STANDARD when the
        fused prover passes standard-form device coefficients via the
        `*_mont`-named args (mont_mul(termR, c) = term*c — each additive
        term lands in the coefficients' target form; see protocol/fused.py
        _stage_lcomb).

        With the optional device coefficient arguments ([L, K] arrays /
        [B, L, T] boundary interpolants) the whole method is traceable with
        the transcript-derived values as traced inputs — used by the fused
        single-program prover (protocol/fused.py).

        `tables` (fused path) supplies every power table as traced program
        parameters ('domain', 'adjust' {group_idx}, 'nc_inv_w', 'ne_fwd_w',
        'incr', 'bdiv') so no multi-MB table gets constant-folded into the
        compiled program as a literal."""
        field = self.field
        dev = field.device
        f = field.host
        Ne = context.evaluation_domain_size
        Nc = context.composition_domain_size

        if q_evals is None:
            q_evals = context.evaluate_transition_constraints(p_polys)  # [C, L, Nc]
        self.log("Computed transition constraint polynomials Q(x)")

        # degree adjustment over the composition domain
        composition_factor = Ne // Nc
        composition_rou = f.exp(context.root_of_unity, composition_factor)
        qa = [q_evals[i] for i in range(q_evals.shape[0])]
        for gi, group in enumerate(self.constraint_groups):
            if group["degree"] == self.combination_degree:
                continue
            if tables is not None:
                powers = tables["adjust"][gi]
            else:
                incremental = self.combination_degree - group["degree"]
                power_seed = f.exp(composition_rou, incremental)
                powers = dev.power_series(power_seed, Nc)
            for i in group["indexes"]:
                qa.append(dev.mul(qa[i], powers))
        self.log("Adjusted degrees of Q(x) polynomials")

        if d_coeffs_mont is None:
            qc = dev.combine_many(qa, self.d_coefficients)           # [L, Nc]
        else:
            qc = dev.combine_many_mont(qa, d_coeffs_mont)
        self.log("Computed linear combination of Q(x) polynomials")

        if tables is not None:
            nc_mxu = tables.get("nc_inv_mxu")
            qc_poly = _transform(field, qc, Nc,
                                 None if nc_mxu is not None else
                                 tables["nc_inv_w"],
                                 tables.get("nc_inv_panel"), nc_mxu)
            if nc_mxu is None:     # MXU bundle folds Nc^-1 into its digits
                qc_poly = dev.mont_mul(qc_poly,
                                       dev.const(f.inv(Nc), shape=(1,)))
            ne_mxu = tables.get("ne_fwd_mxu")
            qe = _transform(field, jnp.pad(qc_poly, [(0, 0), (0, Ne - Nc)]),
                            Ne,
                            None if ne_mxu is not None else
                            tables["ne_fwd_w"],
                            tables.get("ne_fwd_panel"), ne_mxu)
        else:
            qc_poly = ntt.intt(field, qc)
            qe = ntt.low_degree_extend(field, qc_poly, Ne)           # [L, Ne]
        self.log("Performed low degree extensions of Q(x) polynomial")

        domain = tables["domain"] if tables is not None else \
            dev.power_series(context.root_of_unity, Ne)
        self.log("Computed Z(x) polynomial")
        z_inverses = self.z_poly.evaluate_all_inverse(domain)
        self.log("Computed Z(x) inverses")
        d_evals = dev.mul(qe, z_inverses)
        self.log("Computed D(x) polynomial")

        b_vectors = self.b_poly.evaluate_all(p_polys, Ne,
                                             i_polys_mont=b_ipolys_mont,
                                             tables=tables)
        self.log("Computed boundary constraint polynomials B(x)")

        ba = list(b_vectors)
        b_incremental = self.composition_degree - context.trace_length
        if b_incremental > 0:
            if tables is not None:
                psb_powers = tables["incr"]
            else:
                power_seed = f.exp(context.root_of_unity, b_incremental)
                psb_powers = dev.power_series(power_seed, Ne)
            for i in range(self.b_poly.count):
                ba.append(dev.mul(ba[i], psb_powers))
        self.log("Adjusted degrees of B(x) polynomials")

        if not ba:
            bc = dev.zeros((Ne,))
        elif b_coeffs_mont is None:
            bc = dev.combine_many(ba, self.b_coefficients)
        else:
            bc = dev.combine_many_mont(ba, b_coeffs_mont)
        self.log("Computed linear combination of B(x) polynomials")

        return dev.add(d_evals, bc)

    # ----- verifier path ----------------------------------------------------
    def evaluate_at(self, x: int, p_values: List[int], n_values: List[int],
                    s_values: List[int], context, invs=None) -> int:
        """invs: optional (z_den_inv, b_z_invs) precomputed inverses for this
        x — the verifier batches them across query positions."""
        f = self.field.host
        q_values = context.evaluate_constraints_at(x, p_values, n_values, s_values)

        for group in self.constraint_groups:
            if group["degree"] == self.combination_degree:
                continue
            power = f.exp(x, self.combination_degree - group["degree"])
            for i in group["indexes"]:
                q_values.append(f.mul(q_values[i], power))

        qc = 0
        for v, c in zip(q_values, self.d_coefficients):
            qc = f.add(qc, f.mul(v, c))

        z_inv, b_z_invs = invs if invs is not None else (None, None)
        if z_inv is not None:                 # z_inv = Z(x)^-1, pre-batched
            d_value = f.mul(qc, z_inv)
        else:
            d_value = f.div(qc, self.z_poly.evaluate_at(x))

        b_values = self.b_poly.evaluate_at(p_values, x, b_z_invs)
        b_incremental = self.composition_degree - context.trace_length
        if b_incremental > 0:
            power = f.exp(x, b_incremental)
            for i in range(self.b_poly.count):
                b_values.append(f.mul(b_values[i], power))

        b_value = 0
        for v, c in zip(b_values, self.b_coefficients):
            b_value = f.add(b_value, f.mul(v, c))

        return f.add(d_value, b_value)
