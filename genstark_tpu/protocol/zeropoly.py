"""Transition vanishing polynomial Z(x) = (x^T - 1)/(x - x_last).

Mirrors /root/reference/lib/components/ZeroPolynomial.ts: the batch path
returns separate numerator / denominator evaluation vectors (the division is
folded into one batch inversion by the composition polynomial), the point
path divides directly.
"""

from __future__ import annotations

import jax.numpy as jnp


class ZeroPolynomial:
    def __init__(self, context):
        self.context = context
        self.field = context.field
        T = context.trace_length
        ext = context.extension_factor
        self.trace_length = T
        self.x_at_last_step = self.field.exp(
            context.root_of_unity, (T - 1) * ext)

    def evaluate_at(self, x: int) -> int:
        f = self.field.host
        num = f.sub(f.exp(x, self.trace_length), 1)
        den = f.sub(x, self.x_at_last_step)
        return f.div(num, den)

    def evaluate_all(self, domain: jnp.ndarray):
        """domain: [L, Ne] Montgomery evaluation-domain powers.

        numerators[j] = x_j^T - 1 : since x_j = w^j and (w^T) has order ext,
        x^T over the domain is the ext-periodic power series of w^T (the
        reference computes the same thing by striding, `pluckVector` at
        ZeroPolynomial.ts:40).
        denominators[j] = x_j - x_last.
        """
        ctx = self.context
        dev = self.field.device
        Ne = ctx.evaluation_domain_size
        ext = ctx.extension_factor
        w_t = self.field.exp(ctx.root_of_unity, self.trace_length)
        series = dev.power_series(w_t, ext)                   # [L, ext]
        x_to_T = jnp.tile(series, (1, Ne // ext))             # [L, Ne]
        numerators = dev.sub(x_to_T, dev.one((1,)))
        denominators = dev.sub(domain, dev.const(self.x_at_last_step, shape=(1,)))
        return numerators, denominators

    def evaluate_all_inverse(self, domain: jnp.ndarray) -> jnp.ndarray:
        """1/Z(x) over the evaluation domain (with 1/0 := 0 at trace
        positions, the galois convention — see DeviceField.inv).

        Since x^T is ext-periodic over the domain, the numerator x^T - 1
        takes only `ext` distinct values: invert those few and tile, instead
        of a full-domain batch inversion (the reference inverts all Ne values,
        CompositionPolynomial.ts:117 — the periodicity is the TPU-side win).
        """
        ctx = self.context
        f = self.field.host
        dev = self.field.device
        Ne = ctx.evaluation_domain_size
        ext = ctx.extension_factor
        w_t = self.field.exp(ctx.root_of_unity, self.trace_length)
        # host-side tiny inversion: ext standard-form ints
        base = [f.sub(f.exp(w_t, j), 1) for j in range(ext)]
        inv_base = [f.inv(v) if v else 0 for v in base]
        inv_series = dev.from_ints(inv_base)                  # [L, ext]
        inv_numerators = jnp.tile(inv_series, (1, Ne // ext))  # [L, Ne]
        denominators = dev.sub(domain, dev.const(self.x_at_last_step, shape=(1,)))
        return dev.mul(denominators, inv_numerators)
