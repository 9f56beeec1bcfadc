"""Boundary constraints B(x) = (P(x) - I(x)) / Z(x) per asserted register.

Mirrors /root/reference/lib/components/BoundaryConstraints.ts: I interpolates
the asserted (x_step, value) points, Z = prod (x - x_step); the batch path
evaluates I and Z over the whole evaluation domain via LDE, the point path
evaluates the small polynomials directly.  Register order is first-appearance
order of assertions (JS Map insertion order).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp

from .. import ntt


class BoundaryConstraints:
    def __init__(self, assertions, context):
        self.field = context.field
        f = self.field.host
        ext = context.extension_factor
        r_data: Dict[int, dict] = {}
        for a in assertions:
            x = f.exp(context.root_of_unity, a.step * ext)
            z_factor = [f.neg(x), 1]
            data = r_data.get(a.register)
            if data:
                data["xs"].append(x)
                data["ys"].append(a.value % self.field.modulus)
                data["z_poly"] = f.mul_polys(data["z_poly"], z_factor)
            else:
                r_data[a.register] = {"xs": [x], "ys": [a.value % self.field.modulus],
                                      "z_poly": z_factor}
        self.polys = {}
        for register, data in r_data.items():
            i_poly = f.interpolate(data["xs"], data["ys"])
            self.polys[register] = {"i_poly": i_poly, "z_poly": data["z_poly"]}

    @property
    def count(self) -> int:
        return len(self.polys)

    def evaluate_at(self, p_values: List[int], x: int) -> List[int]:
        f = self.field.host
        out = []
        for register, c in self.polys.items():
            z = f.eval_poly_at(c["z_poly"], x)
            i = f.eval_poly_at(c["i_poly"], x)
            p = p_values[register]
            out.append(f.div(f.sub(p, i), z))
        return out

    def evaluate_all(self, p_evaluations: jnp.ndarray, domain_size: int) -> List[jnp.ndarray]:
        """p_evaluations: [R, L, Ne] Montgomery.  Returns a list of [L, Ne]
        B(x) vectors in register insertion order.  Z inverses use the batched
        inverse (inv(0)=0 at assertion points — excluded from queries)."""
        dev = self.field.device
        field = self.field
        out = []
        for register, c in self.polys.items():
            i_coeffs = dev.from_ints([v % field.modulus for v in c["i_poly"]])
            z_coeffs = dev.from_ints([v % field.modulus for v in c["z_poly"]])
            i_vals = ntt.low_degree_extend(field, i_coeffs, domain_size)
            z_vals = ntt.low_degree_extend(field, z_coeffs, domain_size)
            z_inv = dev.inv(z_vals)
            p_minus_i = dev.sub(p_evaluations[register], i_vals)
            out.append(dev.mul(p_minus_i, z_inv))
        return out
