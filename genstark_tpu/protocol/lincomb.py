"""Final FRI-input linear combination L(x).

Mirrors /root/reference/lib/components/LinearCombination.ts: raise P/S
evaluations by x^(compositionDegree - traceLength), combine with PRNG
coefficients drawn from the same seed as the composition coefficients
(offset past them), add to C(x).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


class LinearCombination:
    def __init__(self, seed: bytes, composition_degree: int,
                 coefficient_offset: int, context):
        self.field = context.field
        self.seed = seed
        self.root_of_unity = context.root_of_unity
        self.domain_size = context.trace_length * context.extension_factor
        self.coefficient_offset = coefficient_offset
        self.ps_incremental_degree = composition_degree - context.trace_length
        self._coefficients = None

    def _get_coefficients(self, count: int) -> List[int]:
        if self._coefficients is None:
            values = self.field.prng(self.seed, self.coefficient_offset + count)
            self._coefficients = values[self.coefficient_offset:]
        return self._coefficients

    def compute_many(self, c_evaluations: jnp.ndarray, p_evaluations: jnp.ndarray,
                     s_evaluations: List[jnp.ndarray]) -> jnp.ndarray:
        """c: [L, Ne]; p: [R, L, Ne]; s: list of [L, Ne].  All Montgomery."""
        dev = self.field.device
        f = self.field.host
        ps = [p_evaluations[r] for r in range(p_evaluations.shape[0])] + list(s_evaluations)
        ps2 = []
        if self.ps_incremental_degree > 0:
            power_seed = f.exp(self.root_of_unity, self.ps_incremental_degree)
            ps_powers = dev.power_series(power_seed, self.domain_size)
            for v in ps:
                ps2.append(dev.mul(v, ps_powers))
        all_evals = ps + ps2
        coefficients = self._get_coefficients(len(all_evals))
        combination = dev.combine_many(all_evals, coefficients)
        return dev.add(c_evaluations, combination)

    def compute_one(self, x: int, d_value: int, p_values: List[int],
                    s_values: List[int]) -> int:
        f = self.field.host
        ps = list(p_values) + list(s_values)
        ps2 = []
        if self.ps_incremental_degree > 0:
            power = f.exp(x, self.ps_incremental_degree)
            ps2 = [f.mul(v, power) for v in ps]
        all_values = ps + ps2
        coefficients = self._get_coefficients(len(all_values))
        acc = 0
        for v, c in zip(all_values, coefficients):
            acc = f.add(acc, f.mul(v, c))
        return f.add(d_value, acc)
